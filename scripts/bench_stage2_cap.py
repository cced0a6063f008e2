#!/usr/bin/env python
"""A/B the pass-2 iteration cap (AdmmConfig.stage2_maxiter) at batch 256.

The batch solver vmaps inferLowRankImpl over (instance, restart) lanes, so
the per-column pass-2 while_loop runs every lane to the SLOWEST lane's trip
count (BENCH_lockstep_r05: max 307 vs mean 152.8 trips = 50.2% lockstep
waste).  A cap near the p90 of the trip distribution bounds the straggler;
the full-data refinement stage re-converges the selected restart at full
maxiter.  Measures recoveries/s + median NMSE + quality for caps
{None, 250, 200, 160} with the harvested pass-1 cap (stage1_maxiter=120)
on the bench workload.  Run on the TPU chip:
    python scripts/bench_stage2_cap.py [batch] [warm]
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


def build(batch):
    from twoace_tpu.ops.cplx import Pair

    rng = np.random.default_rng(1)
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

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    key = jax.random.PRNGKey(0)
    ap, b, x_true = build(batch)
    points = []
    for cap in (None, 250, 200, 160):
        cfg = AdmmConfig(maxiter=MAXITER, warm_iters=warm,
                         stage1_maxiter=120, stage2_maxiter=cap)
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
        q = np.asarray(res.quality)
        points.append({
            "stage1_maxiter": 120, "stage2_maxiter": cap,
            "warm_iters": warm,
            "recoveries_per_s": round(batch / dt, 2),
            "iters_per_s": round(iters / dt, 1),
            "selected_iters": iters,
            "median_nmse_db": round(float(np.median(nmse)), 1),
            "p90_nmse_db": round(float(np.percentile(nmse, 90)), 1),
            "min_quality": round(float(q.min()), 3),
            "wall_s": round(dt, 3), "first_call_s": round(first_s, 1),
        })
        print(json.dumps(points[-1]), flush=True)
    out = {"workload": {"nt": NT, "nr": NR, "m": M, "batch": batch,
                        "maxiter": MAXITER},
           "backend": jax.default_backend(), "points": points}
    name = ("BENCH_stage2cap_r05.json" if batch == 256
            else f"BENCH_stage2cap{batch}_r05.json")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()


