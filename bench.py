#!/usr/bin/env python
"""Headline benchmark: SGD pair-updates/s/chip (BASELINE.md metric 1),
self-certifying, **incrementally emitting** (VERDICT r2 task 1: a
timeout must still leave a parsable JSON line).

Section order (cheapest-to-interrupt last); after every section the
FULL result JSON (with the fields measured so far; missing ones null)
is re-printed, flushed, so the last JSON line on stdout is always the
most complete parsable artifact:

  1. CPU oracle baselines (no JAX: seconds)
  2. sweep 1D throughput mode — THE HEADLINE (first JSON emitted here)
  3. in-run certification of the timed throughput config vs the
     bit-exact C++ oracle (rank-MAE / Spearman)
  4. CLI-DEFAULT (zero-kwarg shape-aware auto-config, VERDICT r3
     task 1): certification at the 100k cert shape AND its rate at the
     bench shape (the policy selects the certified throughput settings
     for low-redundancy large workloads)
  5. sweep 1D quality mode (ce=8) rate
  6. 2D layout sweep rate  7. 3D layout sweep rate (BASELINE config 4)
  8. layout stress certification vs the oracle — 2D AND 3D (VERDICT
     r3 task 3; reference prints stress for every layout run,
     /root/reference/src/bin/gfasort.rs:270-273)
  9. roofline: modeled HBM-bytes + VPU-ops per update vs v5e peaks,
     plus the exact applied-updates fraction (VERDICT r3 task 2)
 10. poor-locality bracket: forced gather consensus at the bench
     shape + shuffled-id workload through the auto policy (task 4)
 11. full-schedule (reference iter_max=100) certification of the
     CLI-default config — in the DEFAULT protocol since r5 (reduced
     50k shape; still >= LARGE_S so the policy resolves identically)

Each timed section reports `warmup_s` (trace + compile + first run)
separately from the steady-state rate, so the artifact distinguishes
compile cost from device time (VERDICT r2 weak 1-2).

Set BENCH_FULL=1 for the round-2 protocol (3 repeats everywhere) plus
the full-schedule (reference iter_max=100) certification of the
CLI-default config (VERDICT r3 task 8).  Exits nonzero only on
egregious quality regression (spearman < 0.99).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent))

# Workload: ~1M nodes, 16 paths x 250k steps = 4M steps
N_NODES = int(os.environ.get("BENCH_NODES", 1_000_000))
N_PATHS = int(os.environ.get("BENCH_PATHS", 16))
STEPS = int(os.environ.get("BENCH_STEPS_PER_PATH", 250_000))
# 96 rounds ~= 1s of device time: long enough that the tunnel's fixed
# per-dispatch latency (~150 ms) stops distorting the steady-state rate
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 96))
FULL = os.environ.get("BENCH_FULL", "0") == "1"

# Sweep configs.  Throughput mode amortizes consensus over 48 sweeps;
# quality mode = consensus every 8 sweeps.  NOTE the CLI default
# derives active_frac = clip(N/S, 1/16, 1) (~0.25 on this shape) and
# per_octave=4 — that exact config is certified in section 4.
# active_frac=1.0 (every step proposes a partner every sweep): the
# masked SIMD passes cost the same at any density, and the 100k-node
# certification is BETTER at 1.0 than 0.8 (rank-MAE 3.2e-4 vs 3.8e-4,
# Spearman 0.9999989 vs 0.9999985) — r3 measurement; section 3
# certifies the exact timed config in-run.
QUALITY_CFG = dict(consensus_every=8, per_octave=2, active_frac=1.0,
                   rotate=8, dense_upto=4, proposals=12)
# Round-5 additions to the r4 config (ce=96/po=2/rotate=12, see the
# r2-r4 probe history in git):
#   * dense_upto=4 — the dense jump grid coarsens to {1,2,3,4,6,8}
#     (same <=8 every-phase treatment): 2 fewer buckets/phase,
#     1,740 -> 1,881 M/s, 100k cert unchanged (scratch/r5_bucket_probe)
#   * proposals=12 — each step draws 12 independent partners per
#     sweep (packed into ceil(P/4) i32 words, 8-bit fields) and the
#     bucket passes share ONE update-math evaluation (only the mask
#     extracts/compares scale with P): 1,950 -> 2,974 -> 3,992 ->
#     4,770 -> 5,366 -> 6,210 M/s measured at P=1/2/3/4/8/12 (6,998
#     with the r5.2 shared-chain sampler, sweep_common.sample_blocks); certs
#     FLAT at every P (iter30 3.57e-4, iter100 2.21e-4, quality mode
#     2.09e-4 at P=12 — P-invariant).  P=16 (6 input windows) blows
#     Mosaic's scoped-VMEM stack; 12 is the shipping ceiling.
#   * the r4 iota end guards in the fused kernel are gone (sampler
#     guarantee + INACT halo padding): part of the P=1 1,881->1,950.
# rotate=16 still hits the Mosaic compile bug (scratch/r5_bucket_probe
# retests it every run).
THROUGHPUT_CFG = dict(consensus_every=96, per_octave=2, active_frac=1.0,
                      rotate=12, dense_upto=4, proposals=12)


def _fit_ce(rounds: int, ce: int) -> int:
    """Largest ce' <= ce that divides ``rounds``.  The runner pads the
    schedule to a whole consensus period, so a non-divisor period makes
    the displayed rate silently undercount (ce=192 under the 96-round
    protocol displayed 825 M/s vs a true ~1.5B; ce=32 under 48 rounds
    424 vs ~565 — ADVICE r3).  Configured periods assume the default
    BENCH_ROUNDS=96; any override re-derives them here."""
    ce = max(1, min(ce, rounds))
    while rounds % ce:
        ce -= 1
    return ce

# certification thresholds (calibrated in round 1: 100k-node synthetic
# rank-MAE ~1e-4 of N at the headline config, spearman >= 0.9999;
# thresholds leave ~10x headroom)
MAE_FRAC_MAX = 0.002
SPEARMAN_MIN = 0.999
STRESS_RATIO_MAX = 1.5


def main() -> int:
    import time

    from gfasort_tpu.bench_util import (
        bench_native_1d,
        bench_native_1d_mt,
        bench_sweep_1d,
        bench_sweep_nd,
        layout_quality_vs_oracle,
        sweep_quality_vs_oracle,
        synthetic_path_index,
    )

    err = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    t_start = time.perf_counter()

    result = {
        "metric": "sgd_pair_updates_per_s_per_chip",
        "value": None,
        "unit": "pair-updates/s",
        "vs_baseline": None,
        "vs_baseline_mt": None,
        "quality_mode_value": None,
        "quality_mode_cert": None,
        "quality": None,       # throughput-cfg certification
        "cli_default": None,   # zero-kwarg auto-config cert + rate
        "nd_layout": None,     # 2D (incl. stress cert)
        "nd_layout_3d": None,  # 3D (incl. stress cert)
        "roofline": None,
        "fallback": None,
        "quality_full_schedule": None,  # default protocol (r5): 50k
                                        # shape; BENCH_FULL: 100k
        "oracle_1t": None,
        "oracle_mt": None,
        "elapsed_s": None,
        "partial": True,
    }

    def emit():
        result["elapsed_s"] = round(time.perf_counter() - t_start, 1)
        print(json.dumps(result), flush=True)

    pidx = synthetic_path_index(N_NODES, N_PATHS, STEPS, seed=0)
    err(f"[bench] workload: {pidx.num_nodes} nodes, {pidx.total_steps} steps, "
        f"{pidx.num_paths} paths; rounds={ROUNDS} full={FULL}")

    # re-fit consensus periods to the (possibly overridden) protocol
    for cfg, nr in ((THROUGHPUT_CFG, ROUNDS), (QUALITY_CFG, ROUNDS)):
        fitted = _fit_ce(nr, cfg["consensus_every"])
        if fitted != cfg["consensus_every"]:
            err(f"[bench] WARNING: consensus_every {cfg['consensus_every']} "
                f"does not divide rounds={nr}; using {fitted}")
            cfg["consensus_every"] = fitted

    # ---- 1. CPU oracle baselines (no device, fast) ----
    cpu = bench_native_1d(pidx, n_updates=2_000_000)
    err(f"[bench] oracle 1-thread baseline: {cpu}")
    cpu_mt = bench_native_1d_mt(
        workload=(100_000, 4, 100_000), n_updates_each=4_000_000
    )
    err(f"[bench] oracle all-core baseline: {cpu_mt}")
    rate_1t = cpu["updates_per_s"] if cpu else None
    rate_mt = cpu_mt["updates_per_s"] if cpu_mt else None
    if cpu:
        result["oracle_1t"] = round(rate_1t, 1)
    if cpu_mt:
        result["oracle_mt"] = {
            "updates_per_s": round(rate_mt, 1),
            # vs_baseline_mt's denominator is THIS host's core count —
            # a 64-core Hogwild host would land ~n_workers/64 of the
            # reported ratio (BASELINE.md framing note)
            "n_workers": cpu_mt["n_workers"],
        }

    import jax

    # persistent compilation cache: remote (tunnel) compiles are the
    # dominant cold-start cost
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    err(f"[bench] device: {jax.devices()[0]}")

    # ---- 2. headline: sweep 1D throughput mode ----
    tpu_t = bench_sweep_1d(
        pidx, rounds=ROUNDS, repeats=3 if FULL else 2, **THROUGHPUT_CFG
    )
    err(f"[bench] sweep throughput mode "
        f"(ce={THROUGHPUT_CFG['consensus_every']}): {tpu_t}")
    result["value"] = round(tpu_t["updates_per_s"], 1)
    result["warmup_s"] = round(tpu_t["warmup_s"], 1)
    if rate_1t:
        result["vs_baseline"] = round(tpu_t["updates_per_s"] / rate_1t, 3)
    if rate_mt:
        result["vs_baseline_mt"] = round(tpu_t["updates_per_s"] / rate_mt, 3)
    emit()  # first parsable artifact: headline + baselines

    # ---- 3. certification of the timed throughput config ----
    cn = int(os.environ.get("BENCH_CERT_NODES", 100_000))
    q1 = sweep_quality_vs_oracle(n_nodes=cn, steps_per_path=cn,
                                 **THROUGHPUT_CFG)
    err(f"[bench] 1D certification (throughput cfg vs oracle): {q1}")
    quality_ok = bool(
        q1 is not None
        and q1["rank_mae_frac"] <= MAE_FRAC_MAX
        and q1["spearman"] >= SPEARMAN_MIN
        and tpu_t["final_finite"]
    )
    result["quality"] = {
        "rank_mae_frac": round(q1["rank_mae_frac"], 6) if q1 else None,
        "spearman": round(q1["spearman"], 6) if q1 else None,
        "ok": quality_ok,
    }
    if not quality_ok:
        err("[bench] WARNING: 1D throughput-cfg certification FAILED")
    emit()

    # ---- 4. the CLI default (zero kwargs = shape-aware auto-config,
    # VERDICT r3 task 1): certify it at the cert shape, then time it at
    # the bench shape.  The policy resolves to the throughput settings
    # at both shapes (S/N=4 low redundancy, large S), so the rate run
    # reuses the headline's compiled program. ----
    q_cli = sweep_quality_vs_oracle(n_nodes=cn, steps_per_path=cn)
    err(f"[bench] 1D certification (CLI-default auto-config): {q_cli}")
    cli_rate = bench_sweep_1d(pidx, rounds=ROUNDS, repeats=1)
    err(f"[bench] CLI-default rate at bench shape: {cli_rate}")
    cli_ok = bool(
        q_cli is not None
        and q_cli["rank_mae_frac"] <= MAE_FRAC_MAX
        and q_cli["spearman"] >= SPEARMAN_MIN
        and cli_rate["final_finite"]
    )
    result["cli_default"] = {
        "rank_mae_frac": round(q_cli["rank_mae_frac"], 6) if q_cli else None,
        "spearman": round(q_cli["spearman"], 6) if q_cli else None,
        "rate": round(cli_rate["updates_per_s"], 1),
        "config": {
            "active_frac": cli_rate["active_frac"],
            "consensus_every": cli_rate["consensus_every_eff"],
            "rotate": cli_rate["rotate_eff"],
        },
        "ok": cli_ok,
    }
    if not cli_ok:
        err("[bench] WARNING: CLI-default certification FAILED")
    emit()

    # ---- 5. quality-mode (ce=8) rate + its own certification (every
    # timed 1D config ships with an in-run cert) ----
    tpu_q = bench_sweep_1d(
        pidx, rounds=ROUNDS, repeats=3 if FULL else 1, **QUALITY_CFG
    )
    err(f"[bench] sweep quality mode (ce=8): {tpu_q}")
    result["quality_mode_value"] = round(tpu_q["updates_per_s"], 1)
    qq = sweep_quality_vs_oracle(n_nodes=cn, steps_per_path=cn,
                                 **QUALITY_CFG)
    err(f"[bench] quality-mode certification: {qq}")
    result["quality_mode_cert"] = {
        "rank_mae_frac": round(qq["rank_mae_frac"], 6) if qq else None,
        "spearman": round(qq["spearman"], 6) if qq else None,
        "ok": bool(qq and qq["rank_mae_frac"] <= MAE_FRAC_MAX
                   and qq["spearman"] >= SPEARMAN_MIN
                   and tpu_q["final_finite"]),
    }
    emit()

    # ---- 6-7. nD layout rates (BASELINE configs 3-4).  Rarer
    # consensus has certified flat-to-better at every probed period
    # (ce=8 ratio 1.066, ce=16 1.065, ce=24 1.034 at the derived frac;
    # 0.908/0.886/0.898 at ce=16/32/48 with frac=1.0): see the ND_CE
    # comment below.  active_frac=1.0: same
    # masked-SIMD sweep cost at any density, 4x the counted updates,
    # and the certified stress BEATS the oracle AT THIS SHAPE (ratio
    # 0.908 at frac=1.0 vs 1.065 at the 1/4 floor; section 8 certifies
    # the exact timed config in-run at the same S/N~=4 chromosome
    # shape).  NOTE this is a bench config, not the engine default:
    # on the small many-paths DRB1 fixture frac=1.0 oversmooths
    # (stress 0.43 vs 0.29 at the derived floor), so the CLI keeps the
    # derived frac + ce=8 for real graphs ----
    # ce=48 (was 16): rarer consensus keeps CERTIFYING BETTER (oracle
    # stress ratio 0.898 at ce=48 vs 0.908 at ce=16 on the 20k cert
    # workload) and the R=4 ~35 ms consensus amortizes over 3x the
    # sweeps: 2D 478 -> 587 M/s, 3D 360 -> 445 M/s at the bench shape
    # (scratch/nd_ce_probe.py).  ce must divide the ROUNDS//2 = 48
    # timed sweeps or the runner pads the schedule to a full period
    # and the displayed rate undercounts (ce=32 measured 424 M/s
    # displayed vs ~565 true for exactly this reason).
    # rotate=12 (one fewer bucket/phase): 2D 587 -> 642, 3D 445 -> 512
    # M/s, and the certified stress improves AGAIN (ratio 0.879);
    # ce=48 stays a multiple of rotate.
    ND_CE = _fit_ce(ROUNDS // 2, 48)
    ND_ROT = 12
    ND_FRAC = 1.0
    # r5: same dense-grid + packed multi-proposal wins as 1D (2D
    # 672 -> 2,690 M/s at P=8, 3D 526 -> 1,669 at P=4 — the nD runner
    # clamps the word count by D so the kernel stays <= 5 input
    # windows; stress ratios 0.98 / 0.91, both beat the oracle;
    # scratch/r5_packed_probe.py + /tmp probe series)
    ND_DU = 4
    ND_P = 8
    if ND_CE != 48:
        err(f"[bench] WARNING: nd consensus_every 48 does not divide "
            f"rounds//2={ROUNDS // 2}; using {ND_CE}")
    nd = bench_sweep_nd(pidx, dims=2, rounds=ROUNDS // 2,
                        repeats=2 if FULL else 1, consensus_every=ND_CE,
                        rotate=ND_ROT, active_frac=ND_FRAC,
                        dense_upto=ND_DU, proposals=ND_P)
    err(f"[bench] 2D layout sweep: {nd}")
    result["nd_layout"] = {
        "value": round(nd["updates_per_s"], 1),
        "dims": 2,
        "warmup_s": round(nd["warmup_s"], 1),
        "stress": None, "oracle_stress": None,
        "ok": bool(nd["final_finite"]),
    }
    emit()

    nd3 = bench_sweep_nd(pidx, dims=3, rounds=ROUNDS // 2,
                         repeats=2 if FULL else 1, consensus_every=ND_CE,
                         rotate=ND_ROT, active_frac=ND_FRAC,
                         dense_upto=ND_DU, proposals=ND_P)
    err(f"[bench] 3D layout sweep: {nd3}")
    result["nd_layout_3d"] = {
        "value": round(nd3["updates_per_s"], 1),
        "dims": 3,
        "warmup_s": round(nd3["warmup_s"], 1),
        "ok": bool(nd3["final_finite"]),
    }
    emit()

    # ---- 8. layout stress certification, 2D AND 3D (VERDICT r3
    # task 3: the reference prints sampled stress for every layout run
    # regardless of D, src/bin/gfasort.rs:270-273) ----
    ln = int(os.environ.get("BENCH_CERT_LAYOUT_NODES", 20_000))
    qn = layout_quality_vs_oracle(
        n_nodes=ln, steps_per_path=ln, consensus_every=ND_CE,
        rotate=ND_ROT, active_frac=ND_FRAC, dense_upto=ND_DU,
        proposals=ND_P,
    )
    err(f"[bench] 2D layout certification (vs oracle): {qn}")
    layout_ok = bool(
        qn is not None
        and nd["final_finite"]
        and qn["ratio"] <= STRESS_RATIO_MAX
    )
    result["nd_layout"].update(
        stress=round(qn["stress"], 5) if qn else None,
        oracle_stress=round(qn["oracle_stress"], 5) if qn else None,
        ratio=round(qn["ratio"], 4) if qn else None,
        ok=layout_ok,
    )
    if not layout_ok:
        err("[bench] WARNING: 2D layout certification FAILED")
    emit()

    qn3 = layout_quality_vs_oracle(
        n_nodes=ln, steps_per_path=ln, dims=3, consensus_every=ND_CE,
        rotate=ND_ROT, active_frac=ND_FRAC, dense_upto=ND_DU,
        proposals=ND_P,
    )
    err(f"[bench] 3D layout certification (vs oracle): {qn3}")
    layout3_ok = bool(
        qn3 is not None
        and nd3["final_finite"]
        and qn3["ratio"] <= STRESS_RATIO_MAX
    )
    result["nd_layout_3d"].update(
        stress=round(qn3["stress"], 5) if qn3 else None,
        oracle_stress=round(qn3["oracle_stress"], 5) if qn3 else None,
        ratio=round(qn3["ratio"], 4) if qn3 else None,
        ok=layout3_ok,
    )
    if not layout3_ok:
        err("[bench] WARNING: 3D layout certification FAILED")
    emit()

    # ---- 9. roofline (VERDICT r3 task 2): exact applied-updates
    # count (standalone sampler replay; validity never depends on xs)
    # + modeled bytes/ops per update vs v5e peaks ----
    from gfasort_tpu.bench_util import measure_applied_frac, roofline_model

    af = measure_applied_frac(pidx, rounds=ROUNDS, **THROUGHPUT_CFG)
    err(f"[bench] applied-updates fraction (throughput cfg): {af}")
    result["roofline"] = roofline_model(
        rate=tpu_t["updates_per_s"],
        info=tpu_t,
        # the headline discount: applied / scheduled proposals (the
        # bench numerator); the exact noise-free ratio vs ACTUAL
        # activations is reported alongside (ADVICE r4)
        applied_frac=af["applied_vs_scheduled"],
    )
    result["roofline"]["applied_frac_exact"] = round(af["applied_frac"], 6)
    err(f"[bench] roofline: {result['roofline']}")
    emit()

    # ---- 10. poor-locality bracket (VERDICT r3 task 4): what happens
    # when grid-consensus band locality fails ----
    fb = {}
    os.environ["GFASORT_CONSENSUS"] = "gather"
    try:
        g_r = bench_sweep_1d(pidx, rounds=ROUNDS, repeats=1,
                             **THROUGHPUT_CFG)
    finally:
        os.environ.pop("GFASORT_CONSENSUS", None)
    err(f"[bench] forced-gather consensus rate: {g_r}")
    fb["gather_rate"] = round(g_r["updates_per_s"], 1)
    fb["gather_vs_grid"] = round(
        g_r["updates_per_s"] / tpu_t["updates_per_s"], 3
    )

    from gfasort_tpu.bench_util import shuffled_path_index

    sh_pidx = shuffled_path_index(N_NODES, N_PATHS, STEPS, seed=0)
    s_r = bench_sweep_1d(sh_pidx, rounds=ROUNDS, repeats=1,
                         **THROUGHPUT_CFG)
    err(f"[bench] shuffled-id workload (auto consensus policy): {s_r}")
    fb["shuffled_rate"] = round(s_r["updates_per_s"], 1)
    fb["auto_selected"] = s_r["consensus"]
    fb["shuffled_coverage"] = s_r["consensus_coverage"]
    result["fallback"] = fb
    emit()

    # ---- 11. full-schedule certification of the CLI default at the
    # reference's iter_max=100 (VERDICT r3 task 8 / r4 task 4;
    # contract: src/sgd.rs:217).  Runs in the DEFAULT protocol at a
    # reduced cert shape (still >= LARGE_S total steps, so the policy
    # resolves to the same throughput settings); BENCH_FULL certifies
    # at the full 100k shape. ----
    cn_f = cn if FULL else int(os.environ.get("BENCH_QFS_NODES", 50_000))
    qf = sweep_quality_vs_oracle(
        n_nodes=cn_f, steps_per_path=cn_f, iter_max=100
    )
    err(f"[bench] full-schedule (iter_max=100) certification: {qf}")
    result["quality_full_schedule"] = {
        "rank_mae_frac": round(qf["rank_mae_frac"], 6) if qf else None,
        "spearman": round(qf["spearman"], 7) if qf else None,
        "iter_max": 100,
        "n_nodes": cn_f,
        "ok": bool(qf and qf["rank_mae_frac"] <= MAE_FRAC_MAX
                   and qf["spearman"] >= SPEARMAN_MIN),
    }

    result["partial"] = False
    emit()
    for q in (q1, q_cli):
        if q is not None and q["spearman"] < 0.99:
            return 1  # egregious quality regression: fail loudly
    return 0


if __name__ == "__main__":
    sys.exit(main())
