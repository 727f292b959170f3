"""Probe: which mechanism can feed the dense-bucket (k=1..8) sweep update
cheapest on TPU v5e?

The XLA engine pays ~1.85 ms/sweep for the 8 dense offset buckets at
S=4M because every roll of xs/sidx/dk materializes to HBM (~50 [S]
streams).  A fused kernel reads xs/pos/sidx ONCE (5 streams) if it can
produce the 16 shifted views (s±k, k=1..8) cheaply in VMEM.  Candidate
mechanisms, each probed in isolation on [S] f32 data:

  A. in-kernel VMEM transpose (vertical layout: shifts become sublane
     rolls, transpose in/out per block)
  B. static lane-rolls of the flat block (pltpu.roll on the minor axis)
  C. element-offset HBM->VMEM DMA (load 17 shifted copies of the block)
  X. XLA baseline: sum of 17 jnp.rolls (the materialize-everything cost)

Each probe computes out = sum_k shifted_k(x) (17 terms, k=-8..8) so the
result is checkable against numpy.  Slope timing over two lengths.

Usage: python scratch/dense_probe.py [S_millions]
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os

INTERPRET = os.environ.get("DENSE_PROBE_INTERPRET") == "1"
SM = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
S = int(SM * 1e6) // (128 * 512) * (128 * 512)  # multiple of block
H = 8
KS = list(range(-H, H + 1))

BR = 512  # block rows of 128 lanes -> 64k elements/block


def ref_out(x):
    return sum(np.roll(x, k) for k in KS)


# ---------------------------------------------------------------- X: XLA
@jax.jit
def xla_sum(x):
    return sum(jnp.roll(x, k) for k in KS)


# ------------------------------------------------- A: transpose + sublane
def kern_transpose(x_ref, o_ref):
    # The vertical-dense mechanism.  x block [BR, 128] row-major:
    # element (r, c) = flat r*128 + c.  Transposed xt [128, BR]:
    # xt[c, r] = flat r*128 + c, so flat+1 moves DOWN one sublane of xt
    # (with a lane-carry when c wraps 128).  Build a [128+2H, BR] halo:
    # halo rows above/below come from the neighboring lane-column
    # (one tiny [H, BR] lane-roll each); then every shifted view s+k is
    # a STATIC SUBLANE SLICE xt_h[H+k : H+k+128, :].  Sum the 17
    # slices, transpose back.  Block-boundary lanes (r = 0 / BR-1)
    # wrap within the block; the real kernel would pass block halos.
    xt = x_ref[:].T                        # [128, BR]
    top = pltpu.roll(xt[128 - H:, :], 1, 1)   # c-H..: prev column r-1
    bot = pltpu.roll(xt[:H, :], BR - 1, 1)    # c+128..: next column r+1
    xt_h = jnp.concatenate([top, xt, bot], axis=0)  # [128+2H, BR]
    acc = None
    for k in KS:
        sl = xt_h[H + k: H + k + 128, :]
        acc = sl if acc is None else acc + sl
    o_ref[:] = acc.T


@jax.jit
def pallas_transpose(x):
    x2 = x.reshape(-1, 128)
    n = x2.shape[0] // BR
    return pl.pallas_call(
        kern_transpose,
        grid=(n,),
        in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=INTERPRET,
    )(x2).reshape(-1)


# ---------------------------------------------------- B: static lane rolls
def _roll(x, s, ax):
    return pltpu.roll(x, s % x.shape[ax], ax)


def kern_laneroll(x_ref, o_ref):
    x = x_ref[:]  # [BR, 128] row-major: flat s = r*128 + c
    acc = x
    for k in [kk for kk in KS if kk != 0]:
        # shifted view: flat s+k -> (r + (c+k)//128, (c+k)%128)
        q, rr = divmod(k, 128)  # python floordiv: q in {-1, 0}
        lane = _roll(x, -rr, 1)  # bring lane c+rr into lane c
        # rows whose lane index wrapped need the next row: select
        lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        wrapped = lanes >= 128 - rr
        lane_hi = _roll(lane, -(q + 1), 0)
        lane_lo = _roll(lane, -q, 0)
        acc = acc + jnp.where(wrapped, lane_hi, lane_lo)
    o_ref[:] = acc


@jax.jit
def pallas_laneroll(x):
    x2 = x.reshape(-1, 128)
    n = x2.shape[0] // BR
    return pl.pallas_call(
        kern_laneroll,
        grid=(n,),
        in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        interpret=INTERPRET,
    )(x2).reshape(-1)


# ------------------------------------- C: element-offset HBM->VMEM DMA
def kern_dma(x_hbm, o_ref, *rest):
    nk = len(KS)
    scratch, sems = rest[:nk], rest[nk:]
    i = pl.program_id(0)
    base = i * BR * 128
    cps = []
    for j, k in enumerate(KS):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(H + base + k, BR * 128)],
            scratch[j],
            sems[j],
        )
        cp.start()
        cps.append(cp)
    acc = None
    for j in range(nk):
        cps[j].wait()
        acc = scratch[j][:] if acc is None else acc + scratch[j][:]
    o_ref[:] = acc.reshape(BR, 128)


@jax.jit
def pallas_dma(x):
    xp = jnp.pad(x, (H, H))
    n = x.shape[0] // (BR * 128)
    nk = len(KS)
    return pl.pallas_call(
        kern_dma,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0] // 128, 128), x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((BR * 128,), jnp.float32) for _ in KS]
            + [pltpu.SemaphoreType.DMA for _ in KS]
        ),
        interpret=INTERPRET,
    )(xp).reshape(-1)


def chain_slope(inner, x, n1=8, n2=40, reps=5):
    """Per-call seconds via chain-length slope: run inner n times inside
    one jitted fori_loop; slope over (n2-n1) cancels dispatch latency."""
    import functools as ft

    @ft.partial(jax.jit, static_argnums=1)
    def chain(x0, n):
        return jax.lax.fori_loop(
            0, n, lambda i, x: inner(x) * 0.999 + 1e-6 * i, x0
        )

    def t(n):
        chain(x, n).block_until_ready()
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain(x, n)
            _ = float(r[0])  # dependent readback
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    xs_np = rng.standard_normal(S).astype(np.float32)
    x_small = jnp.asarray(xs_np[: S // 4])
    x_big = jnp.asarray(xs_np)

    # correctness check (small, on-device then compare)
    xs_chk = xs_np[: 128 * BR * 2]
    want = ref_out(xs_chk)
    for name, fn in [("X_xla", xla_sum), ("B_laneroll", pallas_laneroll),
                     ("C_dma", pallas_dma)]:
        got = np.asarray(fn(jnp.asarray(xs_chk)))
        ok = np.allclose(got, want, atol=1e-4)
        if name == "C_dma":
            # edges differ (zero pad vs wrap) — check interior only
            ok = np.allclose(got[H:-H], want[H:-H], atol=1e-4)
        if name == "B_laneroll":
            ok = np.allclose(got[128 * 130:-128 * 130 or None]
                             if False else got, want, atol=1e-4)
            # block edges wrap per-block; interior of one block:
            ok = np.allclose(got[H + 128: 128 * BR - 128],
                             want[H + 128: 128 * BR - 128], atol=1e-4)
        print(f"{name}: correct={bool(ok)}", flush=True)

    for name, fn in [
        ("X_xla_17rolls", xla_sum),
        ("A_transpose", pallas_transpose),
        ("B_laneroll", pallas_laneroll),
        ("C_dma17", pallas_dma),
    ]:
        try:
            ns = slope(fn, x_small, x_big) * 1e9
            print(f"{name}: {ns:.3f} ns/elem -> {ns * S / 1e6:.2f} ms at S={S}",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
