#!/usr/bin/env python
"""A/B the precision-capable megakernel against the XLA float32 path on
the single-recovery latency workload (VERDICT r04 #6: attack the 62 ms
on-chip floor).

Variants: xla_f32_warm80 (production bench baseline), xla_f32_cold,
kernel_split3 (3-pass compensated), kernel_highest (6-pass Mosaic f32).

Device time is isolated from the tunnel RTT by the pipelining identity
(see bench.py::bench_single_latency).  Writes BENCH_kernelprec_<tag>.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from twoace_tpu.config import AdmmConfig
from twoace_tpu.ops.cplx import Pair
from twoace_tpu.ops.pair_solver import solve_lowrank_multi_pair

NT = NR = 16
N = NT * NR
M = 4 * N
MAXITER = 500
REPS = 8


def build():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 4, (M, N))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(N)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    angs = rng.uniform(-1.2, 1.2, 4)
    h = sum((rng.normal() + 1j * rng.normal())
            * np.outer(steer(NR, angs[2 * i]), steer(NT, angs[2 * i + 1]).conj())
            for i in range(2))
    x = h.T.reshape(-1)
    ap = Pair(jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32))
    b = jnp.asarray(np.abs(a @ x), jnp.float32)
    return ap, b, x


def nmse_db(xe, x_true):
    c = np.vdot(xe, x_true) / max(np.vdot(xe, xe).real, 1e-30)
    return 10 * np.log10(max(
        np.linalg.norm(x_true - c * xe) ** 2 / np.linalg.norm(x_true) ** 2,
        1e-30))


def run_variant(name, cfg, ap, b, x_true):
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    res = solve_lowrank_multi_pair(key, ap, b, NT, NR, cfg)
    it0 = int(np.asarray(res.iters).sum())
    first_s = time.perf_counter() - t0
    xe = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
    db = nmse_db(xe, x_true)

    t0 = time.perf_counter()
    for i in range(REPS):
        r = solve_lowrank_multi_pair(jax.random.fold_in(key, i), ap, b,
                                     NT, NR, cfg)
        int(np.asarray(r.iters).sum())
    wall_ms = (time.perf_counter() - t0) / REPS * 1e3
    t0 = time.perf_counter()
    rs = [solve_lowrank_multi_pair(jax.random.fold_in(key, 100 + i), ap, b,
                                   NT, NR, cfg) for i in range(REPS)]
    int(np.asarray(rs[-1].iters).sum())
    pipe_s = time.perf_counter() - t0
    device_ms = max((pipe_s * 1e3 - wall_ms) / (REPS - 1), 0.0)
    point = {"variant": name, "wall_ms": round(wall_ms, 1),
             "device_ms": round(device_ms, 1),
             "rtt_ms": round(max(wall_ms - device_ms, 0.0), 1),
             "nmse_db": round(db, 1), "iters": it0,
             "first_call_s": round(first_s, 1)}
    print(json.dumps(point), flush=True)
    return point


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    ap, b, x_true = build()
    base = AdmmConfig(maxiter=MAXITER)
    variants = [
        ("xla_f32_warm80", dataclasses.replace(base, warm_iters=80)),
        ("xla_f32_cold", base),
        ("kernel_split3", dataclasses.replace(base,
                                              kernel_precision="split3")),
        ("kernel_highest", dataclasses.replace(base,
                                               kernel_precision="highest")),
    ]
    points = []
    for name, cfg in variants:
        try:
            points.append(run_variant(name, cfg, ap, b, x_true))
        except Exception as e:                      # compile failures count
            points.append({"variant": name, "error": str(e)[:400]})
            print(json.dumps(points[-1]), flush=True)
    out = {"workload": {"nt": NT, "nr": NR, "m": M, "maxiter": MAXITER,
                        "reps": REPS,
                        "solver": "solve_lowrank_multi_pair (full scaffold)"},
           "backend": jax.default_backend(), "points": points}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"BENCH_kernelprec_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
