#!/usr/bin/env python
"""Mobility tracking on TPU: adaptive probing that actually TRACKS.

Round-3 postmortem (VERDICT r03 #4): the old workload probed with FULL
random 2-bit rows, under which 80 magnitude-only measurements cannot pin
even a rank-1 16x16 channel — measured: a rank-1-forced solve fits all 80
training magnitudes to 0.000 relative error while the channel NMSE stays
at -0.5 dB (non-identifiable: a wrong channel fits perfectly).  The
REFERENCE's tracking loop never poses that problem: its probe stream is
``cb = kron(rx_codebook, tx_codebook)`` (RSS_Mobility.m "Load data"), so
each 62-probe round shares ONE Rx sector and sweeps Tx sectors — a
structured, separable sensing ensemble under which the per-window solve is
effectively low-dimensional.  This bench reproduces that structure.

Workload: rank-1 LOS channel, kron probe stream (one random 2-bit Rx
sector per window x 62 random Tx sectors), slow angular drift
(0.1 deg/window) plus an abrupt 25-degree jump at window 20 — so BOTH
branches of the adaptive budget rule (ref :167-175) must fire: the reset
branch (err < 0.3 -> M = 0) during smooth tracking and the growth branch
(M <- min(1.2M+1, 80)) after the jump.  The reset events are stochastic:
with the Tx factor pinned, the prediction error on a NEW Rx sector is a
pure scale ratio |c - 1| (c = ratio of the new sector's projection onto
the estimated vs true Rx factor), which dips below 0.3 on a fraction of
windows that grows as the anchored tracker accumulates Rx information —
hence the 40-window horizon.

Two trackers are timed:
  - cold:  the reference's per-window re-solve (make_pair_solver)
  - warm:  warm-started refinement with quality-gated fallback
           (make_warm_pair_solver) — the TPU-native improvement

Writes MOBILITY_r04.json.  Run on the TPU chip:
    python scripts/bench_mobility.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_workload(n_windows=40, jump_at=20):
    from twoace_tpu.config import ArrayConfig

    cfg = ArrayConfig(nt=16, nr=16)
    rng = np.random.default_rng(0)
    p = 62

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    def chan(a_rx, a_tx):
        h = np.outer(steer(cfg.nr, a_rx), steer(cfg.nt, a_tx).conj())
        return h.T.reshape(-1)          # tx-major vec, a @ vec = w^T H f

    # kron probe stream (ref: RSS_Mobility.m cb = kron(rx_cb, tx_cb)):
    # window t = one Rx sector x p Tx sectors
    rows = []
    for t in range(n_windows):
        w = np.exp(1j * rng.integers(0, 4, cfg.nr) * (np.pi / 2)) \
            / np.sqrt(cfg.nr)
        for _ in range(p):
            f = np.exp(1j * rng.integers(0, 4, cfg.nt) * (np.pi / 2)) \
                / np.sqrt(cfg.nt)
            rows.append(np.kron(f, w))
    rows = np.stack(rows).astype(np.complex64)

    g = 1.5 * np.exp(1j * 0.3)
    a_rx, a_tx = 0.4, -0.7
    amps = np.zeros(n_windows * p, np.float32)
    vhs, ats = [], []
    for t in range(n_windows):
        drx = 0.1 * t * np.pi / 180 + (25 * np.pi / 180 if t >= jump_at else 0)
        dtx = -0.1 * t * np.pi / 180
        vh = g * chan(a_rx + drx, a_tx + dtx)
        vhs.append(vh)
        ats.append(steer(cfg.nt, a_tx + dtx))
        amps[t * p:(t + 1) * p] = np.abs(rows[t * p:(t + 1) * p] @ vh)
    return cfg, rows, amps, np.stack(vhs), np.stack(ats), p


def run_tracker(name, solver, cfg, rows, amps, vhs, ats, p, mob):
    from twoace_tpu.pipeline.mobility import track

    key = jax.random.PRNGKey(0)
    n_windows = len(vhs)
    # warmup on the first 2 windows to absorb the compile
    t0 = time.perf_counter()
    track(key, rows[:2 * p], amps[:2 * p], cfg, mob, solver=solver,
          static_pad=True)
    compile_s = time.perf_counter() - t0
    if hasattr(solver, "reset"):
        solver.reset()

    t0 = time.perf_counter()
    trace = track(key, rows, amps, cfg, mob, solver=solver, static_pad=True)
    wall = time.perf_counter() - t0

    nmse_db, at_align = [], []
    for t in range(n_windows):
        x, vh = trace.estimates[t], vhs[t]
        c = np.vdot(x, vh) / max(np.vdot(x, x).real, 1e-30)
        nmse_db.append(round(10 * np.log10(max(
            np.linalg.norm(vh - c * x) ** 2 / np.linalg.norm(vh) ** 2,
            1e-30)), 1))
        # Tx-factor alignment |<v1(H_est), at>| — the quantity a window's
        # 62-Tx-sector sweep can actually pin (the Rx factor is limited to
        # ~1 scalar constraint per window by the kron probing structure)
        h_est = x.reshape(cfg.nt, cfg.nr).T
        _, _, vt = np.linalg.svd(h_est)
        at_align.append(round(float(abs(np.vdot(vt[0].conj(), ats[t]))), 3))
    errs = [round(float(e), 3) for e in trace.rss_error]
    budgets = [int(v) for v in trace.probe_budget]
    return {
        "tracker": name,
        "windows_per_s": round(n_windows / wall, 2),
        "window_latency_ms": round(wall / n_windows * 1e3, 1),
        "first_run_s": round(compile_s, 1),
        "rss_error": errs,
        "probe_budget": budgets,
        "tracked_nmse_db": nmse_db,
        "tracked_at_align": at_align,
        "reset_branch_fired": bool(any(b == 0 for b in budgets[2:])),
        "growth_branch_fired": bool(any(b > 0 for b in budgets[2:])),
    }


def main():
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.pipeline.mobility import (MobilityConfig,
                                              make_pair_solver,
                                              make_warm_pair_solver)

    cfg, rows, amps, vhs, ats, p = build_workload()
    admm = AdmmConfig(maxiter=500)
    mob = MobilityConfig(window_probes=p, max_window=80, admm=admm)

    cold = run_tracker("cold_resolve_ref_semantics",
                       make_pair_solver(cfg, admm), cfg, rows, amps, vhs,
                       ats, p, mob)
    warm = run_tracker("warm_anchored_rank1",
                       make_warm_pair_solver(cfg, admm, use_rank_one=True),
                       cfg, rows, amps, vhs, ats, p, mob)

    out = {
        "workload": {
            "nt": 16, "nr": 16, "window_probes": p, "max_window": 80,
            "n_windows": len(vhs), "maxiter": admm.maxiter,
            "probe_structure": "kron(rx_sector, tx_sector) per ref "
                               "RSS_Mobility.m codebook assembly",
            "channel": "rank-1 LOS, 0.1 deg/window drift, 25 deg jump "
                       "at window 20",
        },
        "backend": jax.default_backend(),
        "trackers": [cold, warm],
        "note": "Both adaptive-budget branches (RSS_Mobility.m:167-175) "
                "must fire: budget 0 during smooth tracking (err < 0.3), "
                "budget growth after the window-20 jump.  r03's failure "
                "was workload mis-posing: full random rows make 80 "
                "magnitude probes non-identifiable (measured: perfect "
                "train fit at -0.5 dB NMSE); the reference's kron "
                "structure is what its loop actually solves.",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MOBILITY_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
