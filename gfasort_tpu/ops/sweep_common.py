"""Shared machinery for the offset-sweep engines (1D, nD, sharded).

Provides the quantized-jump sampling kernel used by all sweep variants:

* exact snap-to-offset via a branch-free where-tree binary search over
  the offset values (no table gathers; r4 — the previous arithmetic
  approximation assumed log-uniform offset sets and silently
  deactivated most proposals on rotation-phase sets),
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

__all__ = ["make_offset_sampler", "INACTIVE", "auto_rotate",
           "auto_sweep_config", "phase_structure", "fit_consensus_period",
           "sweep_rng", "LARGE_S"]


def sweep_rng(key, S: int, fdt, mode: str | None = None):
    """Per-sweep randomness for the sweep engines: (bits u32 [S],
    u in [0,1) [S]).

    Default mode ``hash``: two murmur3-finalizer streams over the lane
    counter, keyed by the (per-sweep, threefry-folded) key's words —
    measured ~free vs 0.151 ms/sweep for the threefry pair at S=4M
    (~6% of the whole sweep budget; the engine is VPU-compute-bound,
    docs/DESIGN.md §8).  The reference itself samples from a
    deterministic sequential stream (Xoshiro256Plus, src/sgd.rs:429);
    a counter-based finalizer hash is the TPU-idiomatic equivalent,
    and the bench certifies the exact shipped configuration against
    the bit-exact oracle every run.  ``GFASORT_SWEEP_RNG=threefry``
    restores jax.random draws (always used for f64 runs).

    Structure note (ADVICE r4): a single ``mix(i + b)`` stream is
    index-SHIFT-correlated across sweeps whose folded key words differ
    by a small integer (``mix((i+d) + b) == mix(i + (b+d))``).  The
    shipped form is two-stage — ``mix(mix(i + b1) ^ f(b2))`` — so a
    shifted counter passes through a second keyed nonlinearity and the
    cross-sweep relation is no simpler than for any two fixed-key
    scrambler streams."""
    import os

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    if mode is None:
        mode = os.environ.get("GFASORT_SWEEP_RNG", "hash")
    if mode == "threefry" or fdt == jnp.float64:
        k1, k2 = jax.random.split(key, 2)
        return (jax.random.bits(k1, (S,), jnp.uint32),
                jax.random.uniform(k2, (S,), dtype=fdt))
    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    b1 = kd[-1]
    b2 = kd[-2] if kd.shape[0] > 1 else kd[-1] ^ jnp.uint32(0xDEADBEEF)
    i = lax.iota(jnp.uint32, S)

    def mix(x):
        x = x * jnp.uint32(0x9E3779B9)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(0xC2B2AE35)
        return x ^ (x >> 16)

    h = mix(i + b1)
    bits = mix(h ^ b2)
    u_bits = mix(h ^ (b2 * jnp.uint32(0x9E3779B9) + jnp.uint32(0x632BE59B)))
    u = (u_bits >> 8).astype(fdt) * fdt(2.0**-24)
    return bits, u


def fit_consensus_period(n_sweeps: int, ce: int, n_phase: int) -> int:
    """Shrink the consensus period so the EXECUTED schedule overshoots
    the nominal one minimally.  The engines run whole periods with the
    sweep index clamped (the terminal-eta padding convention), so a
    101-sweep CLI schedule at ce=96 would execute 2 x 96 = 192 sweeps
    (+90% device work); fitting ce to ceil(101/2) -> 60 (rounded up to
    whole rotations) executes 120 instead, with the same period count.
    More-frequent consensus has certified fine at every period probed,
    so this only trades padded terminal-eta work for an extra mid-run
    consensus or two."""
    ce = max(int(ce), 1)
    n_periods = -(-n_sweeps // ce)
    ce_fit = -(-n_sweeps // n_periods)
    ce_fit = -(-ce_fit // n_phase) * n_phase
    return min(ce, max(ce_fit, 1))


def phase_structure(offs: np.ndarray, rotate, consensus_every: int):
    """Resolve bucket rotation for an offset set (shared by the 1D, nD
    and sharded sweep engines; was four identical copies).

    Each sweep uses the dense offsets (1..8, most of the warm-phase
    Zipf mass) plus every ``rotate``-th large offset, with the phase
    advancing per sweep.  Sweep cost is proportional to the number of
    offset buckets (one fused pass per bucket), so rotation cuts the
    hot-loop cost ~(K/K_phase)x while the aggregate jump distribution
    over ``rotate`` consecutive sweeps matches the full offset set at
    its native resolution.  The global max offset is kept in every
    phase so the top of the jump space stays reachable.  The consensus
    period is rounded up to whole rotations so every phase runs equally
    often (and the phase of a sweep slot stays static in the engines'
    unrolled rotation blocks).

    Returns (phase_offsets, rotate, consensus_every).
    """
    K = len(offs)
    n_dense = int((offs <= 8).sum())
    if rotate == "auto":
        rotate = auto_rotate(K, n_dense)
    rotate = int(max(1, rotate))
    if rotate > 1 and (K - n_dense) < 2 * rotate:
        rotate = 1  # too few large buckets to be worth striding
    if rotate > 1:
        phase_offsets = [
            np.concatenate([offs[:n_dense], offs[n_dense + p :: rotate]])
            for p in range(rotate)
        ]
        phase_offsets = [
            po_ if po_[-1] == offs[-1] else np.append(po_, offs[-1])
            for po_ in phase_offsets
        ]
        consensus_every = -(-consensus_every // rotate) * rotate
    else:
        phase_offsets = [offs]
    return phase_offsets, rotate, int(consensus_every)

# Workloads with at least this many total steps are in the
# "amortization regime": sweep cost is large enough that consensus
# amortization and coarser jump quantization pay for themselves, and
# every quality certification so far has been flat-to-BETTER with the
# aggressive settings (see auto_sweep_config).  Matches the fused
# kernel's size floor (sweep_dense.dense_kernel_enabled).
LARGE_S = 1 << 18


def auto_sweep_config(S: int, N: int, *, layout: bool = False) -> dict:
    """Shape-aware zero-kwarg engine config (VERDICT r3 task 1).

    The r3 CLI default shipped conservative settings everywhere
    (derived frac ~= N/S, consensus_every=8, per_octave=4), measuring
    ~224M upd/s at the bench shape while the same engine certified
    as-well-or-better at 1,565M with the throughput settings.  The
    policy axes, each backed by a measurement:

    * ``active_frac`` — FULL activation when path redundancy S/N <= 5
      steps/node: at S/N=4 (chromosome/genome shapes) frac=1.0
      certifies BETTER than sparser activation (rank-MAE 3.2e-4 vs
      3.8e-4; layout stress ratio 0.88 vs 1.07 — ROUND3_NOTES).  Above
      that, the r2-validated ~1-update-per-node derivation
      ``clip(N/S, floor, 1)``: on the real DRB1 fixture (S/N=7.1)
      quality degrades MONOTONICALLY with frac (1D rank-MAE 0.88e-3 /
      1.07e-3 / 1.78e-3 at frac 0.141 / 0.286 / 0.565; layout stress
      ratio 1.08 / 1.09 / 1.13 — r4 measurement), because real
      pangenome paths overlap the same nodes heavily and full-width
      rounds average many pulls against one stale snapshot.  Synthetic
      many-path walks (scratch/auto_cfg_probe.py) tolerate any frac;
      real redundancy is what the S/N axis detects.
    * ``consensus_every`` — rarer consensus has certified
      flat-to-better at EVERY period probed on >=100k-step workloads
      (1D: identical certs at ce=48/96; layout: ratio 0.908 at ce=16 ->
      0.898 at ce=48), and the R=1 consensus call (~21 ms) dominates
      sweep cost when amortized too often.  Large regime: 96 (1D) / 48
      (layout); below LARGE_S total steps the engine keeps the
      conservative ce=8 that DRB1-scale fixtures were validated at.
    * ``per_octave`` — 2 in the large regime (the certs above are all
      po=2; halves the bucket count), 4 below it (finer jump grid,
      sweep cost negligible).
    * ``rotate`` — 12 in the large regime (measured fastest AND
      best-certifying period; 16 hits a Mosaic compile bug), else the
      measured auto_rotate default.
    * ``dense_upto`` (r5) — 4 in the large regime: the dense jump grid
      coarsens to {1,2,3,4,6,8} (2 fewer VPU-bound buckets/phase, +8%
      rate, 100k cert unchanged to 3 digits; scratch/r5_bucket_probe).
      Small regime keeps the exact 1..8 grid.
    * ``proposals`` (r5) — 12 (1D) / 8 (layout; the nD runner clamps
      by dimensionality) in the large regime: P independent partner
      draws per step per sweep (packed into ceil(P/4) i32 words)
      share ONE bucket-pass update evaluation (1,950 -> 6,210 M
      upd/s at the bench shape across P=1..12); certs are
      P-INVARIANT (1D iter30 3.57e-4, iter100 2.21e-4 at P=4/8/12
      alike; 2D stress ratio 0.98 at P=8, beats the oracle) and
      validated at the genome calibration shape (ROUND5_NOTES
      matrix).  P=16 (6 kernel input windows) blows Mosaic's
      scoped-VMEM stack.  Small regime keeps P=1 (DRB1-scale
      fixtures were certified there, and sweep cost is negligible
      anyway).
    """
    floor = 0.25 if layout else 1.0 / 16.0
    spn = S / max(N, 1)  # path redundancy: steps per node
    if spn <= 5.0:
        frac = 1.0
    else:
        frac = float(np.clip(N / max(S, 1), floor, 1.0))
    large = S >= LARGE_S
    if layout:
        # small-regime layout keeps the DRB1-validated (rotate=8, ce=8,
        # frac floor 1/4) defaults from r2/r3 (sweep_nd.py tuning note)
        return dict(
            active_frac=frac,
            consensus_every=48 if large else 8,
            per_octave=3,
            rotate=12 if large else 8,
            dense_upto=4 if large else 8,
            # the nD runner clamps by dimensionality (D=3 -> 4)
            proposals=8 if large else 1,
        )
    return dict(
        active_frac=frac,
        consensus_every=96 if large else 8,
        per_octave=2 if large else 4,
        rotate=12 if large else "auto",
        dense_upto=4 if large else 8,
        proposals=12 if large else 1,
    )

# Sentinel "no partner chosen" value emitted by sample_block and matched
# by every sweep body (ops/sweep.py, ops/sweep_dense.py, shard engines).
# i32, positive, far above any plausible bucket index; ~INACTIVE is far
# below any ~ki.
INACTIVE = np.int32(0x7FFFFFF)

# Multi-proposal packing (r5): up to 4 signed choices in one i32, one
# 8-bit two's-complement field per proposal.  A choice is ki (0..63),
# ~ki (-64..-1) or INACTIVE8 (127, no ki can equal it).  Packing keeps
# the fused kernel's input-array count independent of P — the unpacked
# P-array variant blew Mosaic's scoped-VMEM stack at 6 input windows
# (1D P=4 / nD P=3), while a field extract is 2 VPU ops.
INACTIVE8 = np.int32(127)
PACKED_INACTIVE = np.int32(0x7F7F7F7F)  # all four fields INACTIVE8


def pack_choices(sidxs):
    """Pack 1-4 signed per-step choice arrays into one i32 array
    (8-bit fields, proposal p in bits [8p, 8p+8)).  Requires every
    bucket index < 64 (enforced by the kernel builders)."""
    import jax.numpy as jnp

    assert 1 <= len(sidxs) <= 4
    packed = None
    for p, s in enumerate(sidxs):
        s8 = jnp.where(s == INACTIVE, jnp.int32(INACTIVE8), s) & jnp.int32(0xFF)
        word = s8 << (8 * p) if p else s8
        packed = word if packed is None else packed | word
    return packed


def pack_choices_words(sidxs):
    """Pack any number of choice arrays into ceil(P/4) i32 words
    (4 fields per word; see :func:`pack_choices`)."""
    return [pack_choices(sidxs[w: w + 4]) for w in range(0, len(sidxs), 4)]


def unpack_choice(packed, p: int):
    """Signed 8-bit field p of a packed choice array (2 VPU ops: shift
    up so the field's sign bit lands on bit 31, arithmetic shift down)."""
    sl = 24 - 8 * p
    x = packed << sl if sl else packed
    return x >> 24


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
    def off_of(i):
        """offs[i] via where-tree (no gather)."""

        def build(lo, hi):
            if hi - lo == 1:
                return jnp.int32(int(offs[lo]))
            mid = (lo + hi) // 2
            return jnp.where(i < mid, build(lo, mid), build(mid, hi))

        return build(0, K)

    def snap_idx_exact(z):
        """EXACT index of the largest offset <= z, as a branch-free
        binary search over the offset values (log2(K) ~ 4-6 levels of
        compare+select, ~12 VPU ops/element — cheaper than the approx
        formula plus correction nudges).

        This replaced snap_idx_approx in the hot sampling path in r4:
        rotation-phase offset sets are NOT log-uniform (dense 1..8,
        stride-`rotate` large entries ~6 octaves apart at po=2/rot=12,
        plus the appended global max), so the log-uniform approx landed
        whole buckets off — measured on the bench throughput config:
        ~60-74%% of proposals deactivated by the off>avail guard or
        snapped to jumps up to ~64x the sampled length.  The exact
        snap restores the documented semantics (sample the jump
        exactly, snap DOWN to the offset set): off <= z <= avail by
        construction, so the overshoot guard almost never fires and
        applied/proposed rises from ~0.26 to ~1."""
        z = jnp.maximum(z, 1)

        def build(lo, hi):
            if hi - lo == 1:
                return jnp.int32(lo)
            mid = (lo + hi) // 2
            return jnp.where(z < jnp.int32(int(offs[mid])),
                             build(lo, mid), build(mid, hi))

        return build(0, K)  # z >= 1 = offs[0], so index 0 is a floor

    def snap_to_offset(z):
        """Index of the largest offset <= z (exact)."""
        return snap_idx_exact(z)

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

    def _zipf_core(u, jump_space, zeta, eta_z, zeta2theta, alpha):
        """Inverse-CDF zipf transform given pre-selected bucketed
        constants (shared by zipf_z and the multi-proposal sampler)."""
        n = jnp.maximum(jump_space, 1).astype(fdt)
        uz = u * zeta
        arg = jnp.maximum(eta_z * u - eta_z + 1.0, 1e-30)
        general = 1.0 + n * jnp.exp(alpha * jnp.log(arg))
        general = jnp.where(jnp.isnan(general), 0.0, general)
        g = jnp.clip(general, 0.0, n).astype(jnp.int32)
        z = jnp.where(uz < 1.0, 1, jnp.where(uz < zeta2theta, 2, g))
        return jnp.minimum(z, jump_space)

    def zipf_z(u, jump_space, cooling):
        # zeta/eta constants are a coarse bucketing of jump_space; the
        # exact snap keeps the bucket choice right on the non-uniform
        # rotation-phase sets too (same cost as the approx since r4)
        js_idx = snap_idx_exact(jnp.maximum(jump_space, 1))
        zeta = const_tree(js_idx, _zw, _zc, cooling)
        eta_z = const_tree(js_idx, _ew, _ec, cooling)
        zeta2theta = jnp.where(cooling, fdt(_z2tc), fdt(_z2tw))
        theta = jnp.where(cooling, fdt(0.001), fdt(theta0))
        alpha = 1.0 / (1.0 - theta)
        return _zipf_core(u, jump_space, zeta, eta_z, zeta2theta, alpha)

    import os as _os

    snap_mode = _os.environ.get("GFASORT_SNAP", "stoch")

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
        oidx = snap_idx_exact(z)
        if snap_mode == "stoch":
            # Mean-preserving stochastic snap (r5): snapping DOWN
            # systematically shortens jumps by up to the grid ratio
            # (~sqrt(2) at po=2), a bias the genome-scale cert exposed
            # as systematic engine-vs-oracle disagreement (engine-self
            # 8e-4 vs engine-oracle 5e-3 at 4M nodes — ROUND5_NOTES).
            # Promote to the next offset with probability
            # (z - lo) / (hi - lo), so E[snapped] = z exactly; the
            # promotion is suppressed when the upper offset exceeds
            # the available rank range.  Uses 9 spare bits of the
            # already-generated coin word (bits 20-28; 29-31 are the
            # direction/zipf/end coins, 0-19 the activation draw).
            off_lo = off_of(oidx).astype(fdt)
            off_hi = off_of(jnp.minimum(oidx + 1, K - 1))
            u2 = ((bits >> 20) & 0x1FF).astype(fdt) * fdt(1.0 / 512.0)
            qfrac = (z.astype(fdt) - off_lo) / jnp.maximum(
                off_hi.astype(fdt) - off_lo, 1.0
            )
            promote = (u2 < qfrac) & (off_hi <= avail)
            oidx = jnp.where(promote, oidx + 1, oidx)
        # Enforce the snapped jump within the available rank range HERE,
        # where avail is already in registers: downstream sweep halves
        # then need NO rank/cnt reads — a choice of +offs[ki] (resp.
        # -offs[ki]) guarantees the partner at that offset is in-path,
        # and paths are contiguous in step space, so the partner index
        # s±k is that step (the only remaining hazard is the roll
        # wraparound at the array ends, guarded by an iota compare).
        # With the exact snap, off <= z <= avail by construction; the
        # mask stays as a safety net (it deactivates nothing in
        # practice — certified by the bench's applied_updates_frac).
        active = act & (forward | backward) & (cnt_a > 1) & (off_of(oidx) <= avail)
        sidx = jnp.where(
            active, jnp.where(backward, ~oidx, oidx), INACTIVE
        ).astype(jnp.int32)
        return sidx

    def snap_idx_track(z, want_hi):
        """snap_idx_exact that also tracks offs[idx] (and, when
        ``want_hi``, offs[min(idx+1, K-1)]) through the SAME binary
        search: 2-3 selects per tree node instead of running 2-3
        separate where-trees (the r5.2 multi-proposal sampler's
        per-proposal hot path)."""
        z = jnp.maximum(z, 1)

        def build(lo, hi):
            if hi - lo == 1:
                hv = (jnp.int32(int(offs[min(lo + 1, K - 1)]))
                      if want_hi else None)
                return jnp.int32(lo), jnp.int32(int(offs[lo])), hv
            mid = (lo + hi) // 2
            li, llv, lhv = build(lo, mid)
            ri, rlv, rhv = build(mid, hi)
            c = z < jnp.int32(int(offs[mid]))
            return (jnp.where(c, li, ri), jnp.where(c, llv, rlv),
                    jnp.where(c, lhv, rhv) if want_hi else None)

        return build(0, K)

    def sample_blocks(bu_pairs, cooling, rank_a, cnt_a, active_frac):
        """P-proposal variant of :func:`sample_block` — BIT-IDENTICAL
        outputs (asserted by tests/test_sweep.py::test_sample_blocks
        _bit_identical), fewer VPU ops.

        Two exact restructurings:

        1. The direction-dependent constant chain (avail ->
           jump_space -> bucketed zeta/eta where-trees) takes only two
           values per element (backward: rank, forward: cnt-1-rank).
           Every op in the chain is elementwise, so
           f(where(b, x, y)) == where(b, f(x), f(y)) exactly; the two
           branch chains are computed ONCE and each proposal selects
           by its direction coin — ~2 chains instead of P.
        2. The per-proposal offset where-trees (snap + off_lo +
           off_hi + the final in-range mask's off_of) fuse into ONE
           value-tracked binary search (snap_idx_track); the
           post-promotion offset needed by the mask is
           where(promote, off_hi, off_lo) — exactly what off_of
           returns at the promoted index, including the degenerate
           oidx=K-1 promotion where off_of clamps to offs[K-1].
        """
        avail_b = rank_a
        avail_f = cnt_a - 1 - rank_a
        shared = []
        for avail_d in (avail_b, avail_f):
            js_d = jnp.minimum(space, avail_d)
            js_idx = snap_idx_exact(jnp.maximum(js_d, 1))
            shared.append((
                js_d,
                const_tree(js_idx, _zw, _zc, cooling),
                const_tree(js_idx, _ew, _ec, cooling),
            ))
        zeta2theta = jnp.where(cooling, fdt(_z2tc), fdt(_z2tw))
        theta = jnp.where(cooling, fdt(0.001), fdt(theta0))
        alpha = 1.0 / (1.0 - theta)
        out = []
        for bits, u in bu_pairs:
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
            avail = jnp.where(backward, avail_b, avail_f)
            jump_space = jnp.where(backward, shared[0][0], shared[1][0])
            zeta = jnp.where(backward, shared[0][1], shared[1][1])
            eta_z = jnp.where(backward, shared[0][2], shared[1][2])
            z_zipf = _zipf_core(u, jump_space, zeta, eta_z,
                                zeta2theta, alpha)
            z_unif = 1 + (
                u * jnp.maximum(avail, 1).astype(fdt)
            ).astype(jnp.int32)
            z = jnp.where(use_zipf, z_zipf, z_unif)
            if snap_mode == "stoch":
                oidx, off_lo_i, off_hi = snap_idx_track(z, True)
                off_lo = off_lo_i.astype(fdt)
                u2 = ((bits >> 20) & 0x1FF).astype(fdt) * fdt(1.0 / 512.0)
                qfrac = (z.astype(fdt) - off_lo) / jnp.maximum(
                    off_hi.astype(fdt) - off_lo, 1.0
                )
                promote = (u2 < qfrac) & (off_hi <= avail)
                oidx = jnp.where(promote, oidx + 1, oidx)
                off_sel = jnp.where(promote, off_hi, off_lo_i)
            else:
                oidx, off_sel, _ = snap_idx_track(z, False)
            active = (act & (forward | backward) & (cnt_a > 1)
                      & (off_sel <= avail))
            out.append(jnp.where(
                active, jnp.where(backward, ~oidx, oidx), INACTIVE
            ).astype(jnp.int32))
        return out

    sample_block.multi = sample_blocks
    return snap_to_offset, zipf_z, sample_block
