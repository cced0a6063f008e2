#!/usr/bin/env python
"""Mobility-tracking throughput on TPU: windows/s with ONE compile.

The reference's tracking loop re-solves the channel per time window on a
sliding probe window (ref: RSS_Mobility.m:155-188).  With dynamic window
shapes every distinct length is a fresh XLA trace+compile; the static-pad
path (pipeline/mobility._pad_window + the b == 0 inactive-row rule) keeps
one compiled solver for the whole run.

Writes MOBILITY_r03.json: windows/s, per-window latency, compile counts.
Run on the TPU chip:  python scripts/bench_mobility.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from twoace_tpu.config import AdmmConfig, ArrayConfig
    from twoace_tpu.pipeline.mobility import (MobilityConfig,
                                              make_pair_solver, track)

    cfg = ArrayConfig(nt=16, nr=16)
    # reference tracking shape: 62 probes/window, 80-probe sliding cap
    mob = MobilityConfig(window_probes=62, max_window=80,
                         admm=AdmmConfig(maxiter=500))
    n_windows = 12

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 4, (n_windows * mob.window_probes, cfg.n))
    cb = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(cfg.n)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    # single dominant path: the reference's tracking scenario is a mobile
    # 60 GHz LOS link (RSS_Mobility.m) — a near-rank-1 H whose ~2(nt+nr)
    # degrees of freedom the <= 80-probe sliding window can actually pin
    # down (a rank-2 channel at nt=nr=16 has more DoF than probes)
    angs = rng.uniform(-1.2, 1.2, 2)
    h = ((rng.normal() + 1j * rng.normal())
         * np.outer(steer(cfg.nr, angs[0]), steer(cfg.nt, angs[1]).conj()))
    vec_h = h.T.reshape(-1)
    # host numpy throughout: track()'s driver is host-side and the axon
    # TPU backend has no complex dtype support
    amps = np.abs(cb @ vec_h).astype(np.float32)
    cb_j = cb.astype(np.complex64)

    solver = make_pair_solver(cfg, mob.admm)
    key = jax.random.PRNGKey(0)

    # warmup run (2 windows) to absorb the single compile
    t_c = time.perf_counter()
    track(key, cb_j[:2 * mob.window_probes], amps[:2 * mob.window_probes],
          cfg, mob, solver=solver, static_pad=True)
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    trace = track(key, cb_j, amps, cfg, mob, solver=solver, static_pad=True)
    wall = time.perf_counter() - t0

    out = {
        "workload": {"nt": 16, "nr": 16, "window_probes": mob.window_probes,
                     "max_window": mob.max_window, "n_windows": n_windows,
                     "maxiter": mob.admm.maxiter},
        "backend": jax.default_backend(),
        "windows_per_s": round(n_windows / wall, 2),
        "window_latency_ms": round(wall / n_windows * 1e3, 1),
        "first_run_s": round(compile_s, 1),
        "final_rss_error": round(float(trace.rss_error[-1]), 4),
        "note": "static_pad=True: one compiled solver for the whole run "
                "(b==0 inactive-row padding); window_latency_ms is the "
                "end-to-end tracked-window latency incl. host loop.  "
                "final_rss_error ~0.8 is EXPECTED: <= 80 magnitude-only "
                "probes cannot pin a 256-dim channel (VSM_r03: A2 needs "
                "m ~= 529 for -10 dB at 16x16), so the adaptive loop "
                "correctly stays in its max-probing regime -- the claim "
                "here is tracked-window THROUGHPUT with one compile.",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MOBILITY_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
