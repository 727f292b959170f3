"""Banded node consensus: the sweep engines' only random-access op,
rebuilt as factorized one-hot MXU matmuls.

Plain consensus is a scatter-mean + gather over ``[S]`` rows
(``xs -> x_node -> xs``), profiled at ~62 ms for S=4M on TPU v5e (with
the static count hoisted) — XLA element scatters/gathers cost ~12 ns
*per row* regardless of width.  This module exploits pangenome locality
instead: after any reasonable sort, the node ids referenced by a tile of
T consecutive steps span a narrow window of the node space.

The step->window reduction is a one-hot contraction, but the one-hot is
never materialized at full width: with ``li = hi*128 + lo`` the window
one-hot factorizes as ``onehot(li) = onehot_hi (x) onehot_lo``, so

    wsum[hi*128+lo] = sum_t oh_hi[t,hi] * (oh_lo[t,lo] * xs[t])

is a ``[Wh,T] @ [T,128]`` matmul (Wh = W/128) — real MXU shapes with
only ``T*(128+Wh)`` one-hot materialization per tile instead of the
``T*W`` a naive one-hot costs.  The way back gathers window rows and
selects with the same two factors.  Per-node counts are static and
precomputed on the host, so only sums move through the kernel.

Window->global merge uses *windowed* row scatter-add (one row per tile,
not one element per step); the way back is a windowed row gather.
Steps whose node falls outside their tile's window are handled by a
small element-scatter fallback; the band coverage is reported so
callers can fall back to plain scatter consensus when locality is poor.

The static arrays (window-local indices, tile bases) are exposed on the
result so hot loops can pass them as jit *arguments* — multi-MB baked
constants have crashed the remote-compile client.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["BandedConsensus", "build_banded_consensus"]

_GROUP = 8   # tiles per Pallas grid step
_LANE = 128  # TPU lane width; the `lo` factor of the index split


@dataclass
class BandedConsensus:
    consensus: object          # (xs [S]) -> (xs_new [S], x_node [N])
    fn: object                 # (xs, lidx, bases, inv_cnt) -> same
    arrays: tuple              # (lidx [n_tiles,T] i32, bases [n_tiles] i32, inv_cnt [N])
    coverage: float
    tile: int
    window: int


def build_banded_consensus(
    step_node: np.ndarray,      # [S] node index per step (>= 0)
    n_nodes: int,
    tile: int = 256,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Build the banded consensus for a static step->node map."""
    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    S = int(step_node.shape[0])
    N = int(n_nodes)
    T = tile
    n_tiles = -(-S // T)
    n_tiles = -(-n_tiles // _GROUP) * _GROUP  # multiple of the group size
    S_pad = n_tiles * T

    node_pad = np.full(S_pad, -1, dtype=np.int64)
    node_pad[:S] = step_node
    tiles = node_pad.reshape(n_tiles, T)

    live_t = tiles >= 0
    big = np.where(live_t, tiles, np.iinfo(np.int64).max)
    mins = big.min(axis=1)
    mins = np.where(mins == np.iinfo(np.int64).max, 0, mins)
    small = np.where(live_t, tiles, -1)
    maxs = small.max(axis=1)
    spans = np.maximum(maxs - mins + 1, 1)

    if window is None:
        # cover ~99% of tiles exactly; stragglers (notably tiles that
        # straddle a path boundary, whose span is unbounded) go to the
        # element fallback instead of inflating the window
        window = int(np.percentile(spans, 99.0)) + 1
    # round up to the lane width so li = hi*LANE + lo tiles exactly
    W = max(-(-int(window) // _LANE) * _LANE, _LANE)
    Wh = W // _LANE

    bases = np.clip(mins, 0, max(N - W, 0)).astype(np.int32)
    lidx = tiles - bases[:, None]
    in_band = live_t & (lidx >= 0) & (lidx < W)
    lidx = np.where(in_band, lidx, -1).astype(np.int32)
    coverage = float(in_band.sum()) / max(S, 1)

    oob_mask = (~in_band) & live_t
    oob_flat = np.flatnonzero(oob_mask.reshape(-1))
    oob_steps_j = jnp.asarray(oob_flat.astype(np.int32))
    oob_nodes_j = jnp.asarray(node_pad[oob_flat].astype(np.int32))
    n_oob = len(oob_flat)

    # static per-node counts (includes oob steps)
    cnt = np.bincount(step_node.astype(np.int64), minlength=N).astype(np.float64)
    inv_cnt_np = (1.0 / np.maximum(cnt, 1.0)).astype(np.float32)
    live_j = jnp.asarray(node_pad >= 0)

    lidx_j = jnp.asarray(lidx)                          # [n_tiles, T]
    bases_j = jnp.asarray(bases)                        # [n_tiles]
    inv_cnt_j = jnp.asarray(inv_cnt_np)                 # [N]

    G = _GROUP
    n_groups = n_tiles // G
    HIGH = jax.lax.Precision.HIGHEST

    # ---------------- Pallas kernels ----------------
    def reduce_kernel(lidx_ref, xs_ref, sum_ref):
        """[G, T] steps -> [G, W] window sums via the factorized
        one-hot: [G, Wh, T] @ [G, T, LANE]."""
        li = lidx_ref[...]                              # [G, T] int32
        xs = xs_ref[...]                                # [G, T] f32
        lo = jax.lax.broadcasted_iota(jnp.int32, (G, T, _LANE), 2)
        oh_lo = (li[:, :, None] & (_LANE - 1)) == lo    # [G, T, LANE]
        a = jnp.where(oh_lo, xs[:, :, None], 0.0)       # [G, T, LANE]
        hi = jax.lax.broadcasted_iota(jnp.int32, (G, Wh, T), 1)
        oh_hi = ((li[:, None, :] >> 7) == hi).astype(jnp.float32)
        out = jax.lax.dot_general(
            oh_hi, a,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        )                                               # [G, Wh, LANE]
        sum_ref[...] = out.reshape(G, W)

    def expand_kernel(lidx_ref, win_ref, out_ref):
        """[G, W] window values -> [G, T] per-step values."""
        li = lidx_ref[...]                              # [G, T]
        win = win_ref[...].reshape(G, Wh, _LANE)        # [G, Wh, LANE]
        hi = jax.lax.broadcasted_iota(jnp.int32, (G, T, Wh), 2)
        oh_hi = ((li[:, :, None] >> 7) == hi).astype(jnp.float32)
        b1 = jax.lax.dot_general(
            oh_hi, win,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=HIGH,
        )                                               # [G, T, LANE]
        lo = jax.lax.broadcasted_iota(jnp.int32, (G, T, _LANE), 2)
        oh_lo = (li[:, :, None] & (_LANE - 1)) == lo
        out_ref[...] = jnp.sum(jnp.where(oh_lo, b1, 0.0), axis=2)

    reduce_call = pl.pallas_call(
        reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, W), jnp.float32),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((G, T), lambda b: (b, 0)),
            pl.BlockSpec((G, T), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((G, W), lambda b: (b, 0)),
        interpret=interpret,
    )

    expand_call = pl.pallas_call(
        expand_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, T), jnp.float32),
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((G, T), lambda b: (b, 0)),
            pl.BlockSpec((G, W), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((G, T), lambda b: (b, 0)),
        interpret=interpret,
    )

    scatter_dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    gather_dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )

    def fn(xs, lidx_a, bases_a, inv_cnt_a):
        """xs [S] -> (xs_new [S], x_node [N]); matches plain
        scatter-mean consensus (oob fallback covers stragglers).
        Static arrays are passed as arguments for hot-loop use."""
        dt = xs.dtype
        xs_pad = jnp.zeros(S_pad, jnp.float32).at[:S].set(
            xs.astype(jnp.float32)
        )
        xs_tiles = xs_pad.reshape(n_tiles, T)
        wsum = reduce_call(lidx_a, xs_tiles)             # [n_tiles, W]

        npad = N + W
        idx = bases_a[:, None].astype(jnp.int32)         # [n_tiles, 1]
        ssum = lax.scatter_add(
            jnp.zeros(npad, jnp.float32), idx, wsum,
            scatter_dnums, indices_are_sorted=False, unique_indices=False,
        )
        if n_oob:
            ssum = ssum.at[oob_nodes_j].add(xs_pad[oob_steps_j])
        x_node = ssum[:N] * inv_cnt_a

        xwin = lax.gather(
            jnp.concatenate([x_node, jnp.zeros(W, x_node.dtype)]),
            idx, gather_dnums, slice_sizes=(W,),
        )                                                # [n_tiles, W]
        xs_new = expand_call(lidx_a, xwin).reshape(S_pad)
        if n_oob:
            xs_new = xs_new.at[oob_steps_j].set(x_node[oob_nodes_j])
        xs_new = jnp.where(live_j, xs_new, xs_pad)
        return xs_new[:S].astype(dt), x_node.astype(dt)

    def consensus(xs):
        return fn(xs, lidx_j, bases_j, inv_cnt_j)

    return BandedConsensus(
        consensus=consensus, fn=fn,
        arrays=(lidx_j, bases_j, inv_cnt_j),
        coverage=coverage, tile=T, window=W,
    )
