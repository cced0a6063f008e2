#!/usr/bin/env python
"""Mobility tracking r05: H-level NMSE decline + cold reset branch
(VERDICT r04 #4).

r04 postmortem: its workload gave every window ONE Rx sector, so each
window contributed a single scalar magnitude |w^H u| toward the Rx factor
— H stayed non-identifiable forever and tracked NMSE sat at ~0 dB even
though Tx alignment was pinned.  The REFERENCE's probe stream is the full
cross product ``cb = kron(rx_codebook, tx_codebook)`` (RSS_Mobility.m
"Load data"): a probing round spans MULTIPLE Rx sectors.  This workload
restores that: each window = 8 Rx sectors x 8 Tx sectors (64 kron
probes), the Rx sector set rotating deterministically through a fixed
16-entry 2-bit codebook (one step per window) so consecutive windows
accumulate complementary Rx loads.  A rank-1 channel has 2(nt+nr) = 64
real dof: one window's 64 magnitudes sit just below magnitude-only
identifiability, two anchored windows are above it — exactly the regime
where the warm tracker's cross-window accumulation must show tracked
NMSE DECLINING, and where the cold tracker's one-window-behind
prediction is good enough under slow drift for the reset branch
(err < 0.3 -> M = 0, ref :167-175) to fire.

Writes MOBILITY_r05.json.  Run on the TPU chip:
    python scripts/bench_mobility_r05.py
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

N_RX_SECTORS = 8        # Rx sectors per window
N_TX_SECTORS = 8        # Tx sectors per window
RX_CB_SIZE = 64         # fixed Rx codebook the window rotates through —
                        # must exceed ~2*nr distinct sectors across the
                        # stream or the Rx factor (31 free real params)
                        # can never be pinned by per-sector magnitudes


def build_workload(n_windows=40, jump_at=20):
    from twoace_tpu.config import ArrayConfig

    cfg = ArrayConfig(nt=16, nr=16)
    rng = np.random.default_rng(0)
    p = N_RX_SECTORS * N_TX_SECTORS

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    def chan(a_rx, a_tx):
        h = np.outer(steer(cfg.nr, a_rx), steer(cfg.nt, a_tx).conj())
        return h.T.reshape(-1)          # tx-major vec, a @ vec = w^T H f

    # fixed 2-bit codebooks (the flashed-.brd model).  TWO probe streams
    # from the same kron cross product, differing only in row selection:
    #   sector stream — windows rotate a sliding 8-sector set through
    #     rx_cb (consecutive windows share 7/8 sectors: the cold
    #     tracker's one-window-behind RSS prediction stays good, so the
    #     reset branch exercises);
    #   fresh-pair stream — every probe draws an independent (w, f)
    #     sector pair (the reference's random row draw from
    #     kron(rx_cb, tx_cb)): 256 fresh pairs put a rank-1 16x16
    #     channel ~4x above the magnitude-only identifiability bound
    #     (measured one-shot: -23.5 dB vs -4.9 dB for 256 probes
    #     sharing 32 sectors — the kron factorization hands the Rx
    #     factor only ONE magnitude per distinct sector).
    rx_cb = np.exp(1j * rng.integers(0, 4, (RX_CB_SIZE, cfg.nr))
                   * (np.pi / 2)) / np.sqrt(cfg.nr)
    rows = []
    for t in range(n_windows):
        w_idx = [(t + j) % RX_CB_SIZE for j in range(N_RX_SECTORS)]
        for j in w_idx:
            w = rx_cb[j]
            for _ in range(N_TX_SECTORS):
                f = np.exp(1j * rng.integers(0, 4, cfg.nt) * (np.pi / 2)) \
                    / np.sqrt(cfg.nt)
                rows.append(np.kron(f, w))
    rows = np.stack(rows).astype(np.complex64)
    rows_fresh = []
    for _ in range(n_windows * p):
        w = np.exp(1j * rng.integers(0, 4, cfg.nr) * (np.pi / 2)) \
            / np.sqrt(cfg.nr)
        f = np.exp(1j * rng.integers(0, 4, cfg.nt) * (np.pi / 2)) \
            / np.sqrt(cfg.nt)
        rows_fresh.append(np.kron(f, w))
    rows_fresh = np.stack(rows_fresh).astype(np.complex64)

    g = 1.5 * np.exp(1j * 0.3)
    a_rx, a_tx = 0.4, -0.7
    amps = np.zeros(n_windows * p, np.float32)
    amps_fresh = np.zeros(n_windows * p, np.float32)
    vhs, ats = [], []
    for t in range(n_windows):
        drx = 0.1 * t * np.pi / 180 + (25 * np.pi / 180 if t >= jump_at else 0)
        dtx = -0.1 * t * np.pi / 180
        vh = g * chan(a_rx + drx, a_tx + dtx)
        vhs.append(vh)
        ats.append(steer(cfg.nt, a_tx + dtx))
        amps[t * p:(t + 1) * p] = np.abs(rows[t * p:(t + 1) * p] @ vh)
        amps_fresh[t * p:(t + 1) * p] = np.abs(
            rows_fresh[t * p:(t + 1) * p] @ vh)
    return (cfg, rows, amps, rows_fresh, amps_fresh, np.stack(vhs),
            np.stack(ats), p)


def run_tracker(name, solver, cfg, rows, amps, vhs, ats, p, mob):
    from twoace_tpu.pipeline.mobility import track

    key = jax.random.PRNGKey(0)
    n_windows = len(vhs)
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
        h_est = x.reshape(cfg.nt, cfg.nr).T
        _, _, vt = np.linalg.svd(h_est)
        at_align.append(round(float(abs(np.vdot(vt[0].conj(), ats[t]))), 3))
    errs = [round(float(e), 3) for e in trace.rss_error]
    budgets = [int(v) for v in trace.probe_budget]
    half = n_windows // 2
    return {
        "tracker": name,
        "windows_per_s": round(n_windows / wall, 2),
        "window_latency_ms": round(wall / n_windows * 1e3, 1),
        "first_run_s": round(compile_s, 1),
        "rss_error": errs,
        "probe_budget": budgets,
        "tracked_nmse_db": nmse_db,
        "tracked_at_align": at_align,
        "nmse_first_quarter_db": round(float(np.median(
            nmse_db[1:n_windows // 4])), 1),
        "nmse_last_quarter_db": round(float(np.median(
            nmse_db[-n_windows // 4:])), 1),
        "nmse_pre_jump_db": round(float(np.median(nmse_db[half // 2:half])),
                                  1),
        "reset_branch_fired": bool(any(b == 0 for b in budgets[2:])),
        "growth_branch_fired": bool(any(b > 0 for b in budgets[2:])),
    }


def main():
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.pipeline.mobility import (MobilityConfig,
                                              make_pair_solver,
                                              make_warm_pair_solver)

    (cfg, rows, amps, rows_fresh, amps_fresh, vhs, ats,
     p) = build_workload()
    admm = AdmmConfig(maxiter=500)
    mob = MobilityConfig(window_probes=p, max_window=80, admm=admm)

    # sector stream: reset-branch semantics (consecutive windows share
    # 7/8 Rx sectors, so cold's one-window-behind prediction is good)
    cold = run_tracker("cold_resolve_ref_semantics",
                       make_pair_solver(cfg, admm), cfg, rows, amps, vhs,
                       ats, p, mob)
    warm = run_tracker("warm_anchored_rank1",
                       make_warm_pair_solver(cfg, admm, use_rank_one=True),
                       cfg, rows, amps, vhs, ats, p, mob)
    # fresh-pair stream + extended horizon: H-level identifiability.
    # A rank-1 16x16 channel has ~62 free real params; the reference's
    # 80-probe window is below the ~2x magnitude-only bound no matter the
    # solver.  256 fresh kron pairs are ~4x above it (one-shot -23.5 dB).
    mob_ext = MobilityConfig(window_probes=p, max_window=256, admm=admm)
    warm_ext = run_tracker(
        "warm_anchored_rank1_freshpairs_window256",
        make_warm_pair_solver(cfg, admm, use_rank_one=True),
        cfg, rows_fresh, amps_fresh, vhs, ats, p, mob_ext)
    cold_ext = run_tracker(
        "cold_freshpairs_window256",
        make_pair_solver(cfg, admm),
        cfg, rows_fresh, amps_fresh, vhs, ats, p, mob_ext)

    out = {
        "workload": {
            "nt": 16, "nr": 16, "window_probes": p, "max_window": 80,
            "n_windows": len(vhs), "maxiter": admm.maxiter,
            "probe_structure": f"{N_RX_SECTORS} Rx x {N_TX_SECTORS} Tx kron "
                               f"sectors per window, Rx set rotating "
                               f"through a fixed {RX_CB_SIZE}-entry 2-bit "
                               f"codebook (ref RSS_Mobility.m kron "
                               f"cross-product stream)",
            "channel": "rank-1 LOS, 0.1 deg/window drift, 25 deg jump "
                       "at window 20",
        },
        "backend": jax.default_backend(),
        "trackers": [cold, warm, warm_ext, cold_ext],
        "note": "Two row selections from the same kron cross product "
                "(ref RSS_Mobility.m codebook): the SECTOR stream "
                "exercises the reset branch (cold prediction stays good "
                "across 7/8-shared-sector windows); the FRESH-PAIR "
                "stream with a 256-probe horizon crosses the H "
                "identifiability bound (rank-1 16x16 = ~62 free params; "
                "80 magnitudes < 2x bound — no solver can pin H from "
                "the reference's 80-probe window; 256 fresh pairs = ~4x) "
                "and is where tracked H-NMSE must go DEEP.  Key "
                "measured contrast: 256 probes sharing 32 sectors give "
                "-4.9 dB one-shot vs -23.5 dB for 256 fresh pairs — the "
                "kron factorization hands the Rx factor only one "
                "magnitude per distinct sector.",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MOBILITY_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
