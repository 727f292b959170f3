"""Fused Pallas kernel for the small-offset buckets of the offset-sweep
engines.

The XLA sweep body pays one fused roll-pass per offset bucket, each
re-streaming xs / sidx / dk from HBM — at S=4M the 8 dense buckets
(k=1..8) alone cost ~1.9 ms of the 3.5-4 ms sweep.  This kernel
computes every bucket with offset |k| <= 8192 in ONE pass over HBM
(xs, pos, sidx in; dsum, csum out).

Mechanism (probed in scratch/dense_probe.py, TPU v5e, S=4M):

* per block, DMA [BR+128, 128] rows (64-row halo each side, row-aligned
  — element-offset HBM slicing is not supported by Mosaic) and
  TRANSPOSE: in the transposed view xt[c, j] = flat (r0+j)*128 + c, so
  flat-consecutive elements are SUBLANE-consecutive.  A shifted view
  s+k with k = q*128 + rr reads row (c+rr) mod 128 with the overflow
  absorbed into the LANE offset (q or q+1).  Mosaic requires every
  view to carry the SAME lane offset, so one lane-rolled copy xt_q is
  materialized per distinct q (shared by all buckets); each view is
  then <= 2 static sublane slices of xt_q / xt_{q+1} concatenated on
  sublanes.  Probed at 0.040 ms for 17 shifted reads + sum +
  writeback of [4M] f32 (the HBM read+write floor); the XLA 17-roll
  equivalent measures 0.50 ms (chain-slope, same protocol).
* update semantics are identical to ops/sweep.py's ``half``
  (reference: src/sgd.rs:509-576): same masks, same f32 arithmetic;
  ``d`` is recomputed from ``pos`` (the same values the static dk
  tables hold, f32 subtraction of identical inputs).
* grid and shapes are data-independent; the kernel runs unchanged
  inside ``shard_map`` (each device passes its local [S_shard] arrays).

Bucket indices are the PHASE's: dense offsets (1..8) have ki = k-1 in
every rotation phase; mid offsets (8 < k <= 8192) carry their
phase-specific index, so the engines build one kernel per phase (XLA's
compile cache dedupes identical traces).

Gated by GFASORT_DENSE_KERNEL={auto,pallas,xla}; 'auto' uses the
kernel on TPU for f32 states above a size floor.  f64 states and CPU
runs keep the XLA path; tests force 'pallas', which on non-TPU
backends runs a pure-jnp reference with the kernel's exact padding
semantics (Pallas interpret mode cannot run under shard_map's
varying-axes checks).
"""

from __future__ import annotations

import os

import numpy as np

from .sweep_common import INACTIVE as INACT
from .sweep_common import PACKED_INACTIVE, unpack_choice

__all__ = [
    "dense_kernel_enabled",
    "build_bucket_apply",
    "build_dense_apply",
    "build_dense_apply_nd",
    "KMAX",
]

_LANE = 128
_HR = 64   # DMA window halo ROWS each side: supports |k| <= 8192 and
           # keeps the transposed lane count a multiple of 128 (Mosaic
           # rejects lane-unaligned concats)
_KMAX_HW = _HR * _LANE  # 8192: largest offset the kernel CAN serve


def kernel_kmax() -> int:
    """Largest offset the engines hand to the fused kernel.  The
    hardware limit is 8192; the DEFAULT is 1024 (VERDICT r2 task 4
    re-measured once per-phase bodies trace once): mid buckets up to
    1024 fold into the kernel for 870M -> 964M pair-updates/s/chip at
    a ~67s cold warmup, matching kmax=8192's rate at 1/6 its compile
    time (r2's dense-only default measured 870M/8192-variant >30 min
    compile under the then per-slot tracing).  Override with
    GFASORT_KERNEL_KMAX (clamped to [0, 8192]); 0 serves no buckets
    (build_bucket_apply then returns None and the engines keep the
    pure-XLA path)."""
    return min(max(int(os.environ.get("GFASORT_KERNEL_KMAX", 1024)), 0), _KMAX_HW)


def dense_kernel_enabled(dtype, S: int, n_dense: int) -> bool:
    """Policy: use the fused bucket kernel for this sweep config?"""
    mode = os.environ.get("GFASORT_DENSE_KERNEL", "auto")
    if mode == "xla":
        return False
    if np.dtype(dtype) != np.float32 or n_dense < 2:
        return False
    if mode == "pallas":
        return True
    import jax

    return jax.default_backend() == "tpu" and S >= 1 << 18


def _qs_for(buckets):
    """Distinct lane-shift values q whose rolled copies vert()
    materializes for these buckets (see kernel comments)."""
    qs = {0}
    for k_, _ in buckets:
        for sg in (+1, -1):
            q_, rr_ = divmod(sg * k_, _LANE)
            qs.add(q_)
            if rr_:
                qs.add(q_ + 1)
    return qs


def _fit_br(br: int, n_arrays: int, n_q: int, budget=None) -> int:
    """Shrink the block row count until the kernel's scoped-VMEM
    footprint fits.  Modeled term: n_arrays x (n_q rolled copies + 1
    scratch window) x [BR + 2*HR, 128] f32/i32.  Mosaic's scoped-vmem
    stack is 16MB and its real usage runs ~2.2-2.7x this model
    (bucket-body temporaries), so the default budget is calibrated at
    5.5MB against the measured OOMs: nD D=3 kmax=1024 modeled 7.4M /
    measured 16.68M, nD D=2 (po=3 phase) modeled ~6.3M / measured
    16.70M — both OOM at BR=256, fit at 128; the 1D kernel (3 arrays,
    modeled ~5.3M) compiles and runs at BR=256."""
    if budget is None:
        budget = int(os.environ.get("GFASORT_KERNEL_VMEM_BUDGET", 5_500_000))
    while br > 64:
        footprint = n_arrays * (n_q + 1) * (br + 2 * _HR) * _LANE * 4
        if footprint <= budget:
            break
        br //= 2
    return br


def _shift_ref(jnp, a, k, fill):
    """Pure-jnp shifted view with the kernel's padding semantics."""
    idx = jnp.arange(a.shape[0])
    ok = (idx + k >= 0) & (idx + k < a.shape[0])
    return jnp.where(ok, jnp.roll(a, -k), fill)


def build_bucket_apply(buckets, S: int, fdt, br: int = 256,
                       interpret=None, vma=None, proposals: int = 1):
    """Build ``apply(xs, pos, sidx, eta) -> (dsum, csum)`` computing the
    contributions of the given ``buckets`` — a list of (k, ki) pairs
    with 1 <= k <= KMAX and ki the bucket's index in the phase's offset
    set (sidx == ki chooses +k, sidx == ~ki chooses -k).

    ``proposals`` > 1 (round 5): ``sidx`` is ONE PACKED i32 array
    (:func:`gfasort_tpu.ops.sweep_common.pack_choices` — P <= 4 signed
    8-bit fields), and the per-(bucket, half) weight is the count of
    proposals selecting the pair.  The expensive per-bucket update
    math (d, mu, dx, mag — the dominant VPU cost of the whole engine,
    docs/DESIGN.md §8) is computed ONCE and shared by all proposals;
    each extra proposal adds only a 2-op field extract plus its mask
    compares, so applied updates scale ~P× for ~(1 + small)× the op
    budget.  Packing keeps the kernel at 3 input windows for any P —
    the unpacked P-array variant blew the scoped-VMEM stack at 6
    windows.

    The r4 iota end guards are gone: a ``+k``/``-k`` choice is
    guaranteed in-path by the sampler (paths are contiguous in step
    space), and the partner-side mask reads the INACT-padded halo
    beyond the array ends, so neither half can fire across the
    boundary (mirrors the applied-counter's argument, ops/sweep.py).

    Arrays are flat [S]; S need not be 128*br-aligned (padded here,
    sliced on return).  When called inside ``shard_map``, pass
    ``vma={axis_name}``.

    Returns None for an empty bucket list (a do-nothing Pallas pass
    would still DMA all inputs; callers fall back to the XLA path).
    """
    if not buckets:
        return None
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    buckets = [(int(k), int(ki)) for k, ki in buckets]
    assert all(1 <= k <= _KMAX_HW for k, _ in buckets)
    P = int(proposals)
    if P > 1:
        # packed 8-bit fields: bucket indices must fit signed 8 bits;
        # P > 4 rides ceil(P/4) packed words
        assert all(ki < 64 for _, ki in buckets)
    n_words = 1 if P == 1 else -(-P // 4)
    SIDX_FILL = INACT if P == 1 else PACKED_INACTIVE

    def _as_words(sidx):
        return list(sidx) if isinstance(sidx, (list, tuple)) else [sidx]

    def _fields(words):
        """Per-proposal signed choice views of the sidx word list."""
        if P == 1:
            return [words[0]]
        return [unpack_choice(words[p // 4], p % 4) for p in range(P)]

    if interpret:
        # Non-TPU (test) path: same math in plain jnp ops.
        def apply_ref(xs, pos, sidx, eta):
            words = _as_words(sidx)
            assert len(words) == n_words
            sidxs = _fields(words)
            one = jnp.asarray(1.0, xs.dtype)
            dsum = jnp.zeros_like(xs)
            csum = jnp.zeros_like(xs)
            eta = jnp.asarray(eta, xs.dtype)
            for k, ki in buckets:
                for sgn in (+1, -1):
                    kk = sgn * k
                    xs_o = _shift_ref(jnp, xs, kk, 0)
                    pos_o = _shift_ref(jnp, pos, kk, 0)
                    sidxs_o = _fields([
                        _shift_ref(jnp, w, kk, SIDX_FILL) for w in words
                    ])
                    w = jnp.zeros_like(xs)
                    for s, s_o in zip(sidxs, sidxs_o):
                        if sgn > 0:
                            wb = (s == ki) | (s_o == ~ki)
                        else:
                            wb = (s == ~ki) | (s_o == ki)
                        w = w + wb.astype(xs.dtype)
                    d = jnp.abs(pos - pos_o)
                    valid = d != 0
                    w = jnp.where(valid, w, 0)
                    safe = jnp.where(valid, d, one)
                    mu = jnp.minimum(eta / safe, one)
                    dx = xs - xs_o
                    dx = jnp.where(dx == 0, jnp.asarray(1e-9, xs.dtype), dx)
                    mag = jnp.abs(dx)
                    # (mu*(mag-safe)/2/mag)*dx == mu*(mag-safe)*(+-0.5)
                    # since dx/|dx| = sign (dx!=0 after the guard) —
                    # one divide per half instead of two (VPU-bound)
                    half_sgn = jnp.where(dx >= 0, jnp.asarray(0.5, xs.dtype),
                                         jnp.asarray(-0.5, xs.dtype))
                    r_x = mu * (mag - safe) * half_sgn
                    dsum = dsum - w * r_x
                    csum = csum + w
            return dsum, csum

        return apply_ref

    qs_all = _qs_for(buckets)
    n_arr = 2 + n_words  # xs, pos, sidx word(s) (packed when P > 1)
    BR = _fit_br(int(br), n_arr, len(qs_all))
    BLK = BR * _LANE
    nb = -(-S // BLK)
    S_pad = nb * BLK
    rows = S_pad // _LANE
    W = BR + 2 * _HR  # window rows = transposed lane count

    def kernel(*refs):
        hbm = refs[:n_arr]
        eta_ref = refs[n_arr]
        dsum_ref, csum_ref = refs[n_arr + 1: n_arr + 3]
        scratch = refs[n_arr + 3: 2 * n_arr + 3]
        sems = refs[-1]

        i = pl.program_id(0)
        r0 = i * BR  # in the _HR-row-padded array: core_start - _HR
        cps = []
        for sj, (src, dst) in enumerate(zip(hbm, scratch)):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(r0, W), :], dst, sems.at[jnp.int32(sj)]
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        # Every view must slice at the SAME lane offset (_HR): Mosaic
        # rejects concats/elementwise ops whose operands carry
        # different lane offsets.  So materialize, per needed lane
        # shift q, one lane-rolled copy xt_q[c, j] = xt[c, j+q]; a
        # shifted view s+k with k = q*128 + rr is then <= 2 slices of
        # xt_q / xt_{q+1} at a fixed lane offset, concatenated on
        # sublanes (the concat dimension).
        qs = qs_all

        def vert(vref):
            xt = vref[:].T  # [128, W]: xt[c, j] = flat (r0+j)*128 + c
            return {
                q: (xt if q == 0 else pltpu.roll(xt, jnp.int32((-q) % W), 1))
                for q in sorted(qs)
            }

        xs_h = vert(scratch[0])
        pos_h = vert(scratch[1])
        sidx_hs = [vert(scratch[2 + w]) for w in range(n_words)]

        def view(hq, k):
            q, rr = divmod(k, _LANE)
            if rr == 0:
                return hq[q][:, _HR: _HR + BR]
            a = hq[q][rr:, _HR: _HR + BR]
            b = hq[q + 1][:rr, _HR: _HR + BR]
            return jnp.concatenate([a, b], axis=0)

        xs = view(xs_h, 0)
        pos = view(pos_h, 0)
        sidxs = _fields([view(h, 0) for h in sidx_hs])
        eta = eta_ref[0, 0]

        one = jnp.float32(1.0)
        dsum = jnp.zeros((_LANE, BR), jnp.float32)
        csum = jnp.zeros((_LANE, BR), jnp.float32)
        for k, ki in buckets:
            for sgn in (+1, -1):
                # sgn=+1: partner ahead (s+k): mine sidx==ki, theirs
                #   (at s+k) sidx==~ki.  No end guards: a choice is
                #   sampler-guaranteed in-path, and the halo beyond the
                #   array ends is INACT-padded (see docstring).
                # sgn=-1: partner behind (s-k): mine sidx==~ki, theirs
                #   sidx==ki.  (mirrors ops/sweep.py half();
                #   src/sgd.rs:509-576)
                kk = sgn * k
                xs_o = view(xs_h, kk)
                pos_o = view(pos_h, kk)
                sidxs_o = _fields([view(h, kk) for h in sidx_hs])
                w = jnp.zeros((_LANE, BR), jnp.float32)
                for sidx, sidx_o in zip(sidxs, sidxs_o):
                    if sgn > 0:
                        wb = (sidx == ki) | (sidx_o == ~ki)
                    else:
                        wb = (sidx == ~ki) | (sidx_o == ki)
                    w = w + wb.astype(jnp.float32)
                d = jnp.abs(pos - pos_o)
                valid = d != 0
                w = jnp.where(valid, w, jnp.float32(0.0))
                safe = jnp.where(valid, d, one)
                mu = jnp.minimum(eta / safe, one)
                dx = xs - xs_o
                dx = jnp.where(dx == 0, jnp.float32(1e-9), dx)
                mag = jnp.abs(dx)
                # dx/|dx| = sign: one divide per half, not two (see
                # the interpret path above; VPU-compute-bound kernel)
                half_sgn = jnp.where(dx >= 0, jnp.float32(0.5),
                                     jnp.float32(-0.5))
                r_x = mu * (mag - safe) * half_sgn
                dsum = dsum - w * r_x
                csum = csum + w
        dsum_ref[:] = dsum.T
        csum_ref[:] = csum.T

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_arr)]
            + [pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)]
        ),
        out_specs=[
            pl.BlockSpec((BR, _LANE), lambda i: (i, 0)),
            pl.BlockSpec((BR, _LANE), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma),
        ],
        scratch_shapes=(
            [pltpu.VMEM((W, _LANE), jnp.float32),
             pltpu.VMEM((W, _LANE), jnp.float32)]
            + [pltpu.VMEM((W, _LANE), jnp.int32) for _ in range(n_words)]
            + [pltpu.SemaphoreType.DMA((n_arr,))]
        ),
        interpret=interpret,
    )

    def apply(xs, pos, sidx, eta):
        """xs/pos [S] fdt, sidx [S] i32 (packed word(s) for P > 1) ->
        (dsum, csum) [S] fdt."""
        words = _as_words(sidx)
        assert len(words) == n_words
        pad = S_pad - S

        def pad2(a, fill):
            if pad:
                a = jnp.pad(a, (0, pad), constant_values=fill)
            a = a.reshape(rows, _LANE)
            return jnp.pad(a, ((_HR, _HR), (0, 0)), constant_values=fill)

        args = ([pad2(xs.astype(jnp.float32), 0),
                 pad2(pos.astype(jnp.float32), 0)]
                + [pad2(wd, SIDX_FILL) for wd in words]
                + [jnp.full((1, 1), eta, jnp.float32)])
        dsum, csum = call(*args)
        return (
            dsum.reshape(-1)[:S].astype(xs.dtype),
            csum.reshape(-1)[:S].astype(xs.dtype),
        )

    return apply


def build_dense_apply(n_dense: int, S: int, fdt, br: int = 256,
                      interpret=None, vma=None):
    """Dense-only (k = 1..n_dense, ki = k-1) wrapper over
    :func:`build_bucket_apply`."""
    return build_bucket_apply(
        [(k, k - 1) for k in range(1, n_dense + 1)], S, fdt,
        br=br, interpret=interpret, vma=vma,
    )


def build_dense_apply_nd(n_dense: int, S: int, D: int, fdt, br: int = 256,
                         interpret=None, vma=None, buckets=None,
                         proposals: int = 1):
    """nD-layout variant of :func:`build_bucket_apply`:
    ``apply(my_pos, sidx, my_c, eta) -> (acc, wacc)`` where ``my_c`` is
    a list of D per-dim coordinate rows [S] (the chosen-end coords the
    nD sweep derives per sweep) and ``acc`` is a list of D delta rows.
    Mirrors ops/sweep_nd.py's half() (src/sgd.rs:1060-1156): Euclidean
    magnitude over D dims, zero-distance guard on deltas[0], r clamp.
    ``buckets`` defaults to the dense set [(k, k-1) for k <= n_dense].

    ``proposals`` > 1: ``sidx`` is ONE PACKED i32 array
    (sweep_common.pack_choices, P <= 4 signed 8-bit fields) and the
    per-(bucket, half) weight is the count of proposals selecting the
    pair (see :func:`build_bucket_apply`; the end-coin and the update
    math are shared, only the partner choice varies).

    br=256 (not 512): the input windows plus their transposed halo'd
    copies and the unrolled buckets' intermediates must fit the 16MB
    scoped-VMEM stack.

    Returns None for an empty bucket list (see build_bucket_apply)."""
    if buckets is not None and not buckets:
        return None
    if n_dense < 1 and buckets is None:
        return None
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if buckets is None:
        buckets = [(k, k - 1) for k in range(1, n_dense + 1)]
    buckets = [(int(k), int(ki)) for k, ki in buckets]
    assert all(1 <= k <= _KMAX_HW for k, _ in buckets)
    P = int(proposals)
    if P > 1:
        assert all(ki < 64 for _, ki in buckets)
    n_words = 1 if P == 1 else -(-P // 4)
    SIDX_FILL = INACT if P == 1 else PACKED_INACTIVE

    def _as_words(sidx):
        return list(sidx) if isinstance(sidx, (list, tuple)) else [sidx]

    def _fields(words):
        if P == 1:
            return [words[0]]
        return [unpack_choice(words[p // 4], p % 4) for p in range(P)]

    if interpret:
        def apply_ref(my_pos, sidx, my_c, eta):
            words = _as_words(sidx)
            assert len(words) == n_words
            sidxs = _fields(words)
            one = jnp.asarray(1.0, my_pos.dtype)
            acc = [jnp.zeros_like(my_pos) for _ in range(D)]
            wacc = jnp.zeros_like(my_pos)
            eta = jnp.asarray(eta, my_pos.dtype)
            for k, ki in buckets:
                for sgn in (+1, -1):
                    kk = sgn * k
                    pos_o = _shift_ref(jnp, my_pos, kk, 0)
                    c_o = [_shift_ref(jnp, c, kk, 0) for c in my_c]
                    sidxs_o = _fields([
                        _shift_ref(jnp, wd, kk, SIDX_FILL) for wd in words
                    ])
                    w = jnp.zeros_like(my_pos)
                    for s, s_o in zip(sidxs, sidxs_o):
                        if sgn > 0:
                            wb = (s == ki) | (s_o == ~ki)
                        else:
                            wb = (s == ~ki) | (s_o == ki)
                        w = w + wb.astype(my_pos.dtype)
                    d_term = jnp.abs(my_pos - pos_o)
                    valid = d_term != 0
                    w = jnp.where(valid, w, 0)
                    safe = jnp.where(valid, d_term, one)
                    mu = jnp.minimum(eta / safe, one)
                    deltas = [a - b for a, b in zip(my_c, c_o)]
                    mag_sq = sum(dd * dd for dd in deltas)
                    zero = mag_sq == 0
                    deltas[0] = jnp.where(
                        zero, jnp.asarray(1e-9, my_pos.dtype), deltas[0])
                    mag_sq = jnp.where(
                        zero, jnp.asarray(1e-18, my_pos.dtype), mag_sq)
                    # rsqrt instead of sqrt + divide (VPU-bound):
                    # mag = mag_sq * inv, 1/mag = inv
                    inv = jax.lax.rsqrt(mag_sq)
                    mag = mag_sq * inv
                    r = jnp.minimum(mu * (mag - safe) * 0.5 * inv, 1e30)
                    wr = w * r
                    acc = [a - wr * dd for a, dd in zip(acc, deltas)]
                    wacc = wacc + w
            return acc, wacc

        return apply_ref

    qs_all = _qs_for(buckets)
    n_in = 1 + n_words + D  # pos, sidx word(s), c_0..c_{D-1}
    # mid buckets (k > 8) in the nD kernel: force BR=128 — measured
    # OOMs at BR=256 do not track the n_q model reliably here (one
    # n_q=7 phase compiled, another blew the 16MB stack by 720KB),
    # and D=3/BR=128 is proven good (9.8 ms/sweep, scratch/
    # nd_kmax_probe.py)
    if any(k > 8 for k, _ in buckets):
        br = min(int(br), 128)
    BR = _fit_br(int(br), n_in, len(qs_all))
    BLK = BR * _LANE
    nb = -(-S // BLK)
    S_pad = nb * BLK
    rows = S_pad // _LANE
    W = BR + 2 * _HR

    def kernel(*refs):
        hbm = refs[:n_in]
        eta_ref = refs[n_in]
        outs = refs[n_in + 1: n_in + 1 + D + 1]
        scratch = refs[n_in + 1 + D + 1: n_in + 1 + D + 1 + n_in]
        sems = refs[-1]

        i = pl.program_id(0)
        r0 = i * BR
        cps = []
        for sj, (src, dst) in enumerate(zip(hbm, scratch)):
            cp = pltpu.make_async_copy(
                src.at[pl.ds(r0, W), :], dst, sems.at[jnp.int32(sj)]
            )
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

        qs = qs_all

        def vert(vref):
            # see the 1D kernel's vert() comment (lane-aligned views)
            xt = vref[:].T
            return {
                q: (xt if q == 0 else pltpu.roll(xt, jnp.int32((-q) % W), 1))
                for q in sorted(qs)
            }

        pos_h = vert(scratch[0])
        sidx_hs = [vert(scratch[1 + w]) for w in range(n_words)]
        c_h = [vert(scratch[1 + n_words + d]) for d in range(D)]

        def view(hq, k):
            q, rr = divmod(k, _LANE)
            if rr == 0:
                return hq[q][:, _HR: _HR + BR]
            a = hq[q][rr:, _HR: _HR + BR]
            b = hq[q + 1][:rr, _HR: _HR + BR]
            return jnp.concatenate([a, b], axis=0)

        pos = view(pos_h, 0)
        sidxs = _fields([view(h, 0) for h in sidx_hs])
        cvs = [view(h, 0) for h in c_h]
        eta = eta_ref[0, 0]

        one = jnp.float32(1.0)
        acc = [jnp.zeros((_LANE, BR), jnp.float32) for _ in range(D)]
        wacc = jnp.zeros((_LANE, BR), jnp.float32)
        for k, ki in buckets:
            for sgn in (+1, -1):
                kk = sgn * k
                pos_o = view(pos_h, kk)
                c_o = [view(h, kk) for h in c_h]
                # no end guards: sampler guarantee + INACT halo (see
                # build_bucket_apply docstring)
                sidxs_o = _fields([view(h, kk) for h in sidx_hs])
                w = jnp.zeros((_LANE, BR), jnp.float32)
                for sidx, sidx_o in zip(sidxs, sidxs_o):
                    if sgn > 0:
                        wb = (sidx == ki) | (sidx_o == ~ki)
                    else:
                        wb = (sidx == ~ki) | (sidx_o == ki)
                    w = w + wb.astype(jnp.float32)
                d_term = jnp.abs(pos - pos_o)
                valid = d_term != 0
                w = jnp.where(valid, w, jnp.float32(0.0))
                safe = jnp.where(valid, d_term, one)
                mu = jnp.minimum(eta / safe, one)
                deltas = [a - b for a, b in zip(cvs, c_o)]
                mag_sq = sum(dd * dd for dd in deltas)
                zero = mag_sq == 0
                deltas[0] = jnp.where(zero, jnp.float32(1e-9), deltas[0])
                mag_sq = jnp.where(zero, jnp.float32(1e-18), mag_sq)
                # rsqrt instead of sqrt + divide (see interpret path)
                inv = jax.lax.rsqrt(mag_sq)
                mag = mag_sq * inv
                r = jnp.minimum(mu * (mag - safe) * 0.5 * inv,
                                jnp.float32(1e30))
                wr = w * r
                acc = [a - wr * dd for a, dd in zip(acc, deltas)]
                wacc = wacc + w
        for d in range(D):
            outs[d][:] = acc[d].T
        outs[D][:] = wacc.T

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_in)]
            + [pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)]
        ),
        out_specs=[pl.BlockSpec((BR, _LANE), lambda i: (i, 0))
                   for _ in range(D + 1)],
        out_shape=[jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
                   for _ in range(D + 1)],
        scratch_shapes=(
            [pltpu.VMEM((W, _LANE), jnp.float32)]
            + [pltpu.VMEM((W, _LANE), jnp.int32) for _ in range(n_words)]
            + [pltpu.VMEM((W, _LANE), jnp.float32) for _ in range(D)]
            + [pltpu.SemaphoreType.DMA((n_in,))]
        ),
        interpret=interpret,
    )

    def apply(my_pos, sidx, my_c, eta):
        words = _as_words(sidx)
        assert len(words) == n_words
        pad = S_pad - S

        def pad2(a, fill):
            if pad:
                a = jnp.pad(a, (0, pad), constant_values=fill)
            a = a.reshape(rows, _LANE)
            return jnp.pad(a, ((_HR, _HR), (0, 0)), constant_values=fill)

        args = [pad2(my_pos.astype(jnp.float32), 0)]
        args += [pad2(wd, SIDX_FILL) for wd in words]
        args += [pad2(c.astype(jnp.float32), 0) for c in my_c]
        args.append(jnp.full((1, 1), eta, jnp.float32))
        outs = call(*args)
        acc = [o.reshape(-1)[:S].astype(my_pos.dtype) for o in outs[:D]]
        wacc = outs[D].reshape(-1)[:S].astype(my_pos.dtype)
        return acc, wacc

    return apply
