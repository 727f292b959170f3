"""Shared machinery for the offset-sweep engines (1D, nD, sharded).

Provides the quantized-jump sampling kernel used by all sweep variants:

* arithmetic snap-to-offset (no searchsorted, no table gathers),
* bucketed DirtyZipfian with per-bucket zeta/eta constants selected via
  a log-depth where-tree (a per-element zeta-table lookup is a hidden
  [S]-sized gather, profiled at ~26 ms/sweep on 4M steps),
* the common per-sweep sampling block (coins from packed bits, jump
  draw, direction masks).

Hard-won TPU rules encoded here (see repo log):
  1. never roll a computed value — recompute from the receiver's side;
  2. pass big arrays as jit arguments, not closures;
  3. no lax.cond inside the round loop — it copies captured operands
     every iteration;
  4. no table gathers in the hot loop — bucket + where-tree.
"""

from __future__ import annotations

import numpy as np

from .fastpow import fast_precise_pow as _fpp_host

__all__ = ["make_offset_sampler", "INACTIVE", "auto_rotate"]

# Sentinel "no partner chosen" value emitted by sample_block and matched
# by every sweep body (ops/sweep.py, ops/sweep_dense.py, shard engines).
# i32, positive, far above any plausible bucket index; ~INACTIVE is far
# below any ~ki.
INACTIVE = np.int32(0x7FFFFFF)


def auto_rotate(K: int, n_dense: int) -> int:
    """Default bucket-rotation period: target ~5 large offset buckets
    per sweep phase, capped at 12.

    Retuned from (K-n_dense)/7.5 cap 8: rarer large buckets keep
    certifying equal-or-BETTER against the bit-exact oracle while
    cutting the VPU-bound bucket passes — measured at rotate=12 vs 8
    (scratch/ce_rotate_probe.py session, 100k cert workload):
    CLI-default config rank-MAE 1.69e-4 vs 1.78e-4 of N, Spearman
    0.99999971 vs 0.99999968, bench-shape rate +34% (168 -> 224 M/s
    at derived frac / ce=8); bench throughput config rank-MAE 2.76e-4
    vs 3.20e-4, rate +4.4%.  The cap stays at 12 (not 16): rotate=16
    phase bucket sets hit a Mosaic compile bug in the fused kernel's
    sublane-concat shifted views ("result/input offset mismatch on
    non-concat dimension")."""
    return int(np.clip(round((K - n_dense) / 5.0), 1, 12))


def make_offset_sampler(offs: np.ndarray, params, zetas: np.ndarray, fdt):
    """Build (snap_to_offset, zipf_z, sample_block) for a static offset
    set.  ``sample_block(...)`` returns the signed per-step choice
    array ``sidx`` (see its docstring).
    """
    import jax.numpy as jnp

    K = len(offs)
    offs = np.asarray(offs)
    space = int(params.space)
    space_max = int(params.space_max)
    quant = int(params.space_quantization_step)
    theta0 = float(params.theta)
    _dense = int((offs <= 8).sum())
    # per_octave is implicit in offs; recover the log spacing directly
    if K > _dense:
        _log_step = (np.log2(offs[-1]) - np.log2(_dense)) / (K - _dense)
    else:
        _log_step = 1.0

    def off_of(i):
        """offs[i] via where-tree (no gather)."""

        def build(lo, hi):
            if hi - lo == 1:
                return jnp.int32(int(offs[lo]))
            mid = (lo + hi) // 2
            return jnp.where(i < mid, build(lo, mid), build(mid, hi))

        return build(0, K)

    def snap_idx_approx(z):
        """Arithmetic offset index for z (no correction, NO where-trees).
        Exact for the dense range; in the log range it can land a bucket
        or two off where the offset set is not exactly log-uniform
        (integer rounding; a rotation phase's appended global-max
        offset).  The sampler's own clamp keeps any overshoot safe, and
        a one-bucket blur on an already-quantized log grid is the same
        approximation class as the snapping itself."""
        z = jnp.maximum(z, 1)
        lz = jnp.log2(z.astype(fdt)) - np.float32(np.log2(max(_dense, 1)))
        m = jnp.floor(lz / fdt(_log_step)).astype(jnp.int32)
        idx_log = _dense - 1 + jnp.maximum(m, 0) + 1
        return jnp.where(z <= _dense, z.astype(jnp.int32) - 1,
                         jnp.clip(idx_log, _dense - 1, K - 1))

    def snap_to_offset(z):
        """Index of the largest offset <= z (exact; used off the hot
        path — each nudge is a where-tree over the offset set)."""
        idx = snap_idx_approx(z)
        z = jnp.maximum(z, 1)
        for _ in range(2):
            too_big = off_of(idx) > z
            idx = jnp.where(too_big, jnp.maximum(idx - 1, 0), idx)
        for _ in range(2):
            nxt = jnp.minimum(idx + 1, K - 1)
            fits = off_of(nxt) <= z
            idx = jnp.where(fits & (nxt > idx), nxt, idx)
        return idx

    def _bucket_consts(theta):
        zeta_k = np.empty(K)
        etaz_k = np.empty(K)
        z2t = 1.0 + _fpp_host(0.5, theta)
        for kidx, n in enumerate(offs.tolist()):
            si = int(min(
                n if n <= space_max else space_max + (n - space_max) // quant + 1,
                len(zetas) - 1,
            ))
            zv = zetas[si] if zetas[si] > 0 else 1.0
            zeta_k[kidx] = zv
            etaz_k[kidx] = (1.0 - _fpp_host(2.0 / n, 1.0 - theta)) / (
                1.0 - z2t / zv
            )
        return zeta_k, etaz_k, z2t

    _zw, _ew, _z2tw = _bucket_consts(theta0)
    _zc, _ec, _z2tc = _bucket_consts(0.001)

    def const_tree(idx, warm_vals, cool_vals, cooling):
        def pick(k):
            return jnp.where(cooling, fdt(cool_vals[k]), fdt(warm_vals[k]))

        def build(lo, hi):
            if hi - lo == 1:
                return pick(lo)
            mid = (lo + hi) // 2
            return jnp.where(idx < mid, build(lo, mid), build(mid, hi))

        return build(0, K)

    def zipf_z(u, jump_space, cooling):
        n = jnp.maximum(jump_space, 1).astype(fdt)
        # zeta/eta constants are a coarse bucketing of jump_space; the
        # approximate index is exactly as meaningful here
        js_idx = snap_idx_approx(jnp.maximum(jump_space, 1))
        zeta = const_tree(js_idx, _zw, _zc, cooling)
        eta_z = const_tree(js_idx, _ew, _ec, cooling)
        zeta2theta = jnp.where(cooling, fdt(_z2tc), fdt(_z2tw))
        theta = jnp.where(cooling, fdt(0.001), fdt(theta0))
        alpha = 1.0 / (1.0 - theta)
        uz = u * zeta
        arg = jnp.maximum(eta_z * u - eta_z + 1.0, 1e-30)
        general = 1.0 + n * jnp.exp(alpha * jnp.log(arg))
        general = jnp.where(jnp.isnan(general), 0.0, general)
        g = jnp.clip(general, 0.0, n).astype(jnp.int32)
        z = jnp.where(uz < 1.0, 1, jnp.where(uz < zeta2theta, 2, g))
        return jnp.minimum(z, jump_space)

    def sample_block(bits, u, cooling, rank_a, cnt_a, active_frac):
        """Single signed choice array ``sidx`` for one sweep:
        ``ki`` = chose partner at +offs[ki], ``~ki`` (= -ki-1) = chose
        partner at -offs[ki], INACTIVE otherwise.  One i32 array instead
        of two bool masks — packed-pred arrays crossing fusion
        boundaries trigger multi-ms layout-conversion copies on TPU."""
        coin1 = (bits >> 31) == 1
        coin2 = ((bits >> 30) & 1) == 1
        act = (
            (bits & 0xFFFFF) < jnp.uint32(active_frac * (1 << 20))
            if active_frac < 1.0
            else (bits | 1) > 0
        )
        use_zipf = cooling | coin1
        backward = (rank_a > 0) & (coin2 | (rank_a == cnt_a - 1))
        forward = (~backward) & (rank_a < cnt_a - 1)
        avail = jnp.where(backward, rank_a, cnt_a - 1 - rank_a)
        jump_space = jnp.minimum(space, avail)
        z_zipf = zipf_z(u, jump_space, cooling)
        z_unif = 1 + (u * jnp.maximum(avail, 1).astype(fdt)).astype(jnp.int32)
        z = jnp.where(use_zipf, z_zipf, z_unif)
        oidx = snap_idx_approx(z)
        # Enforce the snapped jump within the available rank range HERE,
        # where avail is already in registers: downstream sweep halves
        # then need NO rank/cnt reads — a choice of +offs[ki] (resp.
        # -offs[ki]) guarantees the partner at that offset is in-path,
        # and paths are contiguous in step space, so the partner index
        # s±k is that step (the only remaining hazard is the roll
        # wraparound at the array ends, guarded by an iota compare).
        # the approximate snap can overshoot z by a bucket; this mask
        # both keeps the guarantee and deactivates those rare terms.
        active = act & (forward | backward) & (cnt_a > 1) & (off_of(oidx) <= avail)
        sidx = jnp.where(
            active, jnp.where(backward, ~oidx, oidx), INACTIVE
        ).astype(jnp.int32)
        return sidx

    return snap_to_offset, zipf_z, sample_block
