#!/usr/bin/env python
"""Batch-size sweep of the full production solver.

Times ``solve_lowrank_multi_pair_batch`` (the COMPLETE inferLowRankV4_multi
scaffold, see bench.py) at SOLVE_BATCH in {16, 64, 256}, with and without
the mixed-precision warm phase (config.AdmmConfig.warm_iters), and writes
``BENCH_sweep_r04.json`` with per-point accuracy so the speed/quality trade
is visible in one artifact.

Run on the TPU chip:  python scripts/bench_batch_sweep.py [warm_iters]
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

NT = NR = 16
N = NT * NR
M = 4 * N
MAXITER = 500


def build(batch, seed=1):
    from twoace_tpu.ops.cplx import Pair

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (M, N))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(N)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    bs, xs = [], []
    for _ in range(batch):
        angs = rng.uniform(-1.2, 1.2, 4)
        h = sum((rng.normal() + 1j * rng.normal())
                * np.outer(steer(NR, angs[2 * i]),
                           steer(NT, angs[2 * i + 1]).conj())
                for i in range(2))
        x = h.T.reshape(-1)
        xs.append(x)
        bs.append(np.abs(a @ x))
    ap = Pair(jnp.asarray(a.real, jnp.float32),
              jnp.asarray(a.imag, jnp.float32))
    return ap, jnp.asarray(np.stack(bs), jnp.float32), np.stack(xs)


def main():
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.pair_solver import solve_lowrank_multi_pair_batch

    # default matches the committed BENCH_sweep artifact, the pinned
    # test (test_artifacts.py: pts[(batch, 80)]), and bench.py WARM_ITERS
    warm = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    tag = sys.argv[2] if len(sys.argv) > 2 else "r04"
    key = jax.random.PRNGKey(0)
    points = []
    for batch in (16, 64, 256):
        ap, b, x_true = build(batch)
        # (warm, stage1 cap) configs: cold f32, warm phase, and (r05)
        # warm + the 120-iteration pass-1 cap (BENCH_stage1cap_r05.json)
        variants = [(0, None), (warm, None)]
        if tag != "r04":
            variants.append((warm, 120))
        for w, cap in variants:
            cfg = AdmmConfig(maxiter=MAXITER, warm_iters=w,
                             stage1_maxiter=cap)
            t_c = time.perf_counter()
            res = solve_lowrank_multi_pair_batch(key, ap, b, NT, NR, cfg)
            iters = int(np.sum(np.asarray(res.iters)))
            first_s = time.perf_counter() - t_c

            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                res = solve_lowrank_multi_pair_batch(key, ap, b, NT, NR, cfg)
                iters = int(np.sum(np.asarray(res.iters)))
            dt = (time.perf_counter() - t0) / reps
            x_est = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
            nmse = []
            for u in range(batch):
                c = np.vdot(x_est[u], x_true[u]) / max(
                    np.vdot(x_est[u], x_est[u]).real, 1e-30)
                nmse.append(10 * np.log10(max(
                    np.linalg.norm(x_true[u] - c * x_est[u]) ** 2
                    / np.linalg.norm(x_true[u]) ** 2, 1e-30)))
            points.append({
                "solve_batch": batch,
                "warm_iters": w,
                "stage1_maxiter": cap,
                "iters_per_s": round(iters / dt, 1),
                "recoveries_per_s": round(batch / dt, 2),
                "selected_iters": iters,
                "median_nmse_db": round(float(np.median(nmse)), 1),
                "wall_s": round(dt, 3),
                "first_call_s": round(first_s, 1),
            })
            print(json.dumps(points[-1]), flush=True)

    out = {
        "workload": {"nt": NT, "nr": NR, "m": M, "maxiter": MAXITER,
                     "solver": "solve_lowrank_multi_pair_batch (staged)"},
        "backend": jax.default_backend(),
        "matmul_precision": AdmmConfig().matmul_precision,
        "points": points,
        "note": ("warm_iters > 0 = mixed-precision schedule: the first "
                 "warm_iters iterations of each inner solve run at "
                 "single-pass 'default' MXU precision (~3x cheaper), the "
                 "f32 tail finishes convergence (config.AdmmConfig."
                 "warm_iters).  Lockstep-waste accounting "
                 "(BENCH_lockstep_r04.json) measured only ~12% vmap "
                 "lockstep waste in the first pass — trip counts are "
                 "uniform (mean 174, max 183 at batch 256) — so the r03 "
                 "'30-40% on the table' hypothesis is rejected; the "
                 "throughput lever is the per-iteration f32-emulation "
                 "cost, attacked here with the warm phase."),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"BENCH_sweep_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
