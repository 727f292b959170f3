"""Pallas TPU kernel for the offset-sweep apply pass.

The XLA sweep body (ops/sweep.py) is a Python loop over K offset
buckets, each bucket reading several rolled [S] streams from HBM —
profiled at ~18 ms/sweep for S=4M, K=38 on TPU v5e, ~6x over the
single-pass bandwidth floor, because every bucket re-streams the state.

This kernel makes the sweep a SINGLE pass over HBM: each block of the
padded state (``xs``, ``pos``, ``sidx``) is DMA'd into VMEM once with
halo, then all K buckets are applied entirely in VMEM.  A "partner at
flat offset ±k" read is a STATIC row slice of the halo'd block plus a
STATIC lane roll (k = 128·q + r: rows shift by q, lanes by r with a
carry select) — no gathers, no HBM re-reads, no dynamic shuffles.

Hard-won Mosaic lessons (measured on TPU v5e, S=4M, K=38):
  * a fori_loop over buckets needs dynamic VMEM slices + dynamic lane
    rotates — ~46 ms/sweep, slower than the XLA roll engine (dynamic
    vector-base loads and rotates decompose into shuffle networks);
  * a straight-line unroll of all K buckets gets NO VMEM stack reuse
    from Mosaic (~2 MB of live temporaries per bucket -> 68 MB stack);
  * the shipped structure — a second grid dimension over GROUPS of
    statically-unrolled buckets, each group body inside its own
    ``pl.when`` region, accumulating into persistent VMEM scratch —
    keeps every access static AND bounds the stack to one group.

Semantics are identical to ``ops.sweep.sweep``'s update given the same
``sidx`` choice array (reference semantics: src/sgd.rs:509-576 — w=1/d
term updates with the same masked-mean accumulation across buckets).

Memory layout: all arrays are viewed as [rows, 128].  The state is
padded with H = ceil(max_offset/128)*128 zero elements on both sides so
every shifted read stays in bounds; padded elements carry cnt=0 /
sidx=INACTIVE and can never form a valid pair (rank/cnt masking), so
zero padding is inert.
"""

from __future__ import annotations

import numpy as np

__all__ = ["build_sweep_apply", "INACTIVE"]

INACTIVE = np.int32(0x7FFFFFF)

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_sweep_apply(
    offs: np.ndarray,
    S: int,
    fdt,
    tile: int = 64 * 1024,
    group: int = 4,
    interpret: bool = False,
):
    """Build the fused sweep-apply kernel for a static offset set.

    Returns ``(apply_fn, layout)`` where
    ``apply_fn(xs_pad2, pos_pad2, sidx_pad2, rank2, cnt2, eta) ->
    xs_new [S_pad]`` and ``layout`` (dict) describes the padded shapes
    the caller must provide via :func:`pad_static` / :func:`pad_state` /
    :func:`pad_sidx`.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    offs = [int(k) for k in np.asarray(offs)]
    K = len(offs)
    max_off = max(offs)

    T = int(min(tile, _round_up(S, 8 * _LANE)))
    Tr = T // _LANE
    Hr = _round_up(max_off, _LANE) // _LANE
    H = Hr * _LANE
    S_pad = _round_up(S, T)
    nb = S_pad // T
    L = S_pad + 2 * H
    Lr = L // _LANE
    G = int(group)
    NG = -(-K // G)

    def kernel(eta_ref, xs_hbm, pos_hbm, sidx_hbm, rank_ref, cnt_ref,
               out_ref, xs_v, pos_v, sidx_v, dsum_v, csum_v, sems):
        i = pl.program_id(0)
        g = pl.program_id(1)

        cps = [
            pltpu.make_async_copy(
                src.at[pl.ds(i * Tr, Tr + 2 * Hr), :],
                dst.at[pl.ds(0, Tr + 2 * Hr), :],
                sems.at[j],
            )
            for j, (src, dst) in enumerate(
                ((xs_hbm, xs_v), (pos_hbm, pos_v), (sidx_hbm, sidx_v))
            )
        ]

        @pl.when(g == 0)
        def _():
            for cp in cps:
                cp.start()
            dsum_v[...] = jnp.zeros((Tr, _LANE), fdt)
            csum_v[...] = jnp.zeros((Tr, _LANE), fdt)
            for cp in cps:
                cp.wait()

        eta = eta_ref[0]
        xs = xs_v[Hr : Hr + Tr, :]
        pos = pos_v[Hr : Hr + Tr, :]
        sidx = sidx_v[Hr : Hr + Tr, :]
        rank = rank_ref[...]
        cnt = cnt_ref[...]

        def shifted(buf, off):
            """[Tr,128] view of flat positions center+t+off of a halo'd
            block (static row slice + static lane roll + carry select)."""
            start = H + off
            q, r = divmod(start, _LANE)
            a = buf[q : q + Tr, :]
            if r == 0:
                return a
            b = buf[q + 1 : q + 1 + Tr, :]
            ra = pltpu.roll(a, _LANE - r, axis=1)
            rb = pltpu.roll(b, _LANE - r, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Tr, _LANE), 1)
            return jnp.where(lane < _LANE - r, ra, rb)

        def bucket(ki):
            # mirror ops/sweep.py:sweep exactly (same op order per bucket)
            k = offs[ki]

            def half(off, w_bool, pair_ok):
                pos_o = shifted(pos_v, off)
                xs_o = shifted(xs_v, off)
                d = jnp.abs(pos - pos_o)
                valid = pair_ok & (d != 0)
                w = (valid & w_bool).astype(fdt)
                safe = jnp.where(valid, d, fdt(1.0))
                mu = jnp.minimum(eta / safe, fdt(1.0))
                dx = xs - xs_o
                dx = jnp.where(dx == 0, fdt(1e-9), dx)
                mag = jnp.abs(dx)
                r_x = (mu * (mag - safe) / 2.0 / mag) * dx
                return -w * r_x, w

            # partner ahead (t+k): I chose +k, or they chose -k
            d1, w1 = half(
                +k,
                (sidx == ki) | (shifted(sidx_v, +k) == ~ki),
                rank + k < cnt,
            )
            # partner behind (t-k): I chose -k, or they chose +k
            d2, w2 = half(
                -k,
                (sidx == ~ki) | (shifted(sidx_v, -k) == ki),
                rank >= k,
            )
            return d1 + d2, w1 + w2

        # one statically-unrolled group of buckets per grid step; each
        # group body lives in its own pl.when region so the VMEM stack
        # only ever holds one group's temporaries
        for gi in range(NG):

            @pl.when(g == gi)
            def _(gi=gi):
                for ki in range(gi * G, min((gi + 1) * G, K)):
                    dd, ww = bucket(ki)
                    dsum_v[...] = dsum_v[...] + dd
                    csum_v[...] = csum_v[...] + ww

        @pl.when(g == NG - 1)
        def _():
            out_ref[...] = xs + dsum_v[...] / jnp.maximum(csum_v[...], 1)

    jfdt = jnp.dtype(fdt)
    grid_call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S_pad // _LANE, _LANE), jfdt),
        grid=(nb, NG),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eta (1,)
            pl.BlockSpec(memory_space=pltpu.ANY),   # xs_pad   [Lr,128]
            pl.BlockSpec(memory_space=pltpu.ANY),   # pos_pad  [Lr,128]
            pl.BlockSpec(memory_space=pltpu.ANY),   # sidx_pad [Lr,128]
            pl.BlockSpec((Tr, _LANE), lambda i, g: (i, 0)),  # rank
            pl.BlockSpec((Tr, _LANE), lambda i, g: (i, 0)),  # cnt
        ],
        out_specs=pl.BlockSpec((Tr, _LANE), lambda i, g: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((Tr + 2 * Hr + 1, _LANE), jfdt),
            pltpu.VMEM((Tr + 2 * Hr + 1, _LANE), jfdt),
            pltpu.VMEM((Tr + 2 * Hr + 1, _LANE), jnp.int32),
            pltpu.VMEM((Tr, _LANE), jfdt),
            pltpu.VMEM((Tr, _LANE), jfdt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(15.5 * 1024 * 1024),
        ),
        interpret=interpret,
    )

    def apply_fn(xs_pad2, pos_pad2, sidx_pad2, rank2, cnt2, eta):
        out2 = grid_call(
            jnp.asarray(eta, jfdt).reshape(1),
            xs_pad2, pos_pad2, sidx_pad2, rank2, cnt2,
        )
        return out2.reshape(S_pad)

    layout = dict(S=S, S_pad=S_pad, H=H, L=L, Lr=Lr, T=T, nb=nb, K=K,
                  G=G, NG=NG)
    return apply_fn, layout


def pad_static(arr: np.ndarray, layout: dict, fill=0, dtype=None):
    """Host-side: pad a [S] array to the kernel's [Lr,128] layout."""
    out = np.full(layout["L"], fill, dtype=dtype or arr.dtype)
    out[layout["H"] : layout["H"] + layout["S"]] = arr
    return out.reshape(layout["Lr"], _LANE)


def pad_state(xs, layout: dict):
    """Device-side: place per-sweep [S] state into the padded 2D view."""
    import jax.numpy as jnp
    import jax.lax as lax

    flat = jnp.zeros(layout["L"], xs.dtype)
    flat = lax.dynamic_update_slice(flat, xs, (layout["H"],))
    return flat.reshape(layout["Lr"], _LANE)


def pad_sidx(sidx, layout: dict):
    import jax.numpy as jnp
    import jax.lax as lax

    flat = jnp.full(layout["L"], INACTIVE, jnp.int32)
    flat = lax.dynamic_update_slice(flat, sidx, (layout["H"],))
    return flat.reshape(layout["Lr"], _LANE)
