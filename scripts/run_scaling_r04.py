#!/usr/bin/env python
"""Round-4 scaling artifact: SCALING_r04.json.

Adds the two points VERDICT r03 #5 called for on top of SCALING_r03:

1. **32x32 / m = 4096 row-sharded measurement** — the shape SCALING_r03
   explicitly reserved row sharding for ("shapes whose per-chip slice
   dwarfs the psum").  One recovery, measurement rows split over a 1x2
   virtual-CPU mesh, pair representation (the on-TPU path), compared to
   the same solve on 1 device.  On 2 shared CPU cores this BOUNDS the ICI
   regime (CPU "collectives" are memcpy through shared memory and both
   shards fight for the same FLOPs); the communication model below maps
   the measured per-iteration compute to TPU ICI numbers.
2. **Production-scaffold sharded point**: solve_lowrank_multi_sharded_pair
   (CV restarts + quality gate + rank-1 retry + rollback, row-sharded
   inner solves) on a (2 batch x 2 rows) mesh — the multi-chip path now
   runs the SAME algorithm as the single-chip solver
   (tests/test_parallel.py pins output parity; this measures it).

Run:  python scripts/run_scaling_r04.py   (CPU; ~15 min)
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np          # noqa: E402
import jax                  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp     # noqa: E402


def build(nt, m, batch, seed=0):
    from twoace_tpu.ops.cplx import Pair

    n = nt * nt
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (batch, m, n))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    xs, bs = [], []
    for u in range(batch):
        angs = rng.uniform(-1.2, 1.2, 4)
        h = sum((rng.normal() + 1j * rng.normal())
                * np.outer(steer(nt, angs[2 * i]),
                           steer(nt, angs[2 * i + 1]).conj())
                for i in range(2))
        x = h.T.reshape(-1)
        xs.append(x)
        bs.append(np.abs(a[u] @ x))
    ap = Pair(jnp.asarray(a.real, jnp.float32),
              jnp.asarray(a.imag, jnp.float32))
    return ap, jnp.asarray(np.stack(bs), jnp.float32), np.stack(xs)


def row_sharded_32(maxiter=60):
    """One 32x32 / m=4096 recovery, rows over 1 vs 2 devices."""
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.cplx import Pair
    from twoace_tpu.parallel.mesh import (BATCH_AXIS, ROWS_AXIS, make_mesh,
                                          problem_sharding)
    from twoace_tpu.parallel.sharded_pair import solve_lowrank_sharded_pair

    nt, m = 32, 4096
    ap, b, x_true = build(nt, m, 1)
    cfg = AdmmConfig(maxiter=maxiter, n_restarts=1)

    out = {}
    for rows in (1, 2):
        mesh = make_mesh(batch=1, rows=rows,
                         devices=jax.devices()[:rows])
        a_sh, b_sh = problem_sharding(mesh)
        a_put = Pair(jax.device_put(ap.re, a_sh), jax.device_put(ap.im, a_sh))
        b_put = jax.device_put(b, b_sh)
        x = solve_lowrank_sharded_pair(mesh, a_put, b_put, nt, nt, cfg)
        np.asarray(x.re)                       # compile + run
        t0 = time.perf_counter()
        x = solve_lowrank_sharded_pair(mesh, a_put, b_put, nt, nt, cfg)
        xr = np.asarray(x.re) + 1j * np.asarray(x.im)
        dt = time.perf_counter() - t0
        c = np.vdot(xr[0], x_true[0]) / max(np.vdot(xr[0], xr[0]).real, 1e-30)
        nmse = 10 * np.log10(max(
            np.linalg.norm(x_true[0] - c * xr[0]) ** 2
            / np.linalg.norm(x_true[0]) ** 2, 1e-30))
        out[f"rows{rows}_s"] = round(dt, 2)
        out[f"rows{rows}_nmse_db"] = round(float(nmse), 1)
    out["strong_scaling_speedup"] = round(out["rows1_s"] / out["rows2_s"], 3)
    out["note"] = ("one 32x32/m=4096 recovery, rows split over the mesh; "
                   "2 shared CPU cores bound (not measure) the ICI regime")
    return out


def production_sharded_point(maxiter=150):
    """The full scaffold on a (2 x 2) mesh vs single-chip, 8x8."""
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.cplx import Pair
    from twoace_tpu.ops.pair_solver import solve_lowrank_multi_pair
    from twoace_tpu.parallel.mesh import make_mesh, problem_sharding
    from twoace_tpu.parallel.sharded_pair import (
        solve_lowrank_multi_sharded_pair)

    nt, m, batch = 8, 256, 2
    ap, b, x_true = build(nt, m, batch, seed=3)
    cfg = AdmmConfig(maxiter=maxiter, n_restarts=2)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(batch=2, rows=2, devices=jax.devices()[:4])
    a_sh, b_sh = problem_sharding(mesh)
    a_put = Pair(jax.device_put(ap.re, a_sh), jax.device_put(ap.im, a_sh))
    b_put = jax.device_put(b, b_sh)

    xs, qs = solve_lowrank_multi_sharded_pair(mesh, keys, a_put, b_put,
                                              nt, nt, cfg)
    np.asarray(xs.re)
    t0 = time.perf_counter()
    xs, qs = solve_lowrank_multi_sharded_pair(mesh, keys, a_put, b_put,
                                              nt, nt, cfg)
    x_sh = np.asarray(xs.re) + 1j * np.asarray(xs.im)
    dt_sh = time.perf_counter() - t0

    t0 = time.perf_counter()
    nmse_1 = []
    for u in range(batch):
        res = solve_lowrank_multi_pair(keys[u], Pair(ap.re[u], ap.im[u]),
                                       b[u], nt, nt, cfg)
        x1 = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
        c1 = np.vdot(x1, x_true[u]) / max(np.vdot(x1, x1).real, 1e-30)
        nmse_1.append(round(float(10 * np.log10(max(
            np.linalg.norm(x_true[u] - c1 * x1) ** 2
            / np.linalg.norm(x_true[u]) ** 2, 1e-30))), 1))
    dt_1 = time.perf_counter() - t0

    def nmse(x, u):
        c = np.vdot(x, x_true[u]) / max(np.vdot(x, x).real, 1e-30)
        return 10 * np.log10(max(np.linalg.norm(x_true[u] - c * x) ** 2
                                 / np.linalg.norm(x_true[u]) ** 2, 1e-30))

    return {
        "mesh": "2 batch x 2 rows",
        "sharded_wall_s": round(dt_sh, 2),
        "single_wall_s_incl_compile": round(dt_1, 2),
        "sharded_quality": [round(float(q), 3) for q in np.asarray(qs)],
        "sharded_nmse_db": [round(float(nmse(x_sh[u], u)), 1)
                            for u in range(batch)],
        "single_nmse_db": nmse_1,
        "note": "production inferLowRankV4_multi scaffold with row-sharded "
                "inner solves (parity test: tests/test_parallel.py::"
                "test_sharded_multi_scaffold_matches_single_chip_quality)",
    }


def communication_model_32():
    """psum traffic vs compute per iteration at 32x32 on TPU numbers."""
    r, nt = 20, 32
    n = nt * nt
    m = 4096
    # per iteration per instance: one psum of the (r, n) pair partial +
    # one fused scalar-norms psum (negligible)
    psum_bytes = r * n * 2 * 4
    mm = lambda a, b, c: 3 * 2 * a * b * c
    flops = mm(r, m, n) + mm(r, n, n) + mm(r, n, m) \
        + 2 * mm(nt, r * nt, nt) + 8 * mm(nt, nt, nt)
    chip_flops = 27e12          # sustained fp32-emulated (measured r03)
    ici_bw = 186e9              # v5e ICI per link per direction
    ici_lat = 1e-6
    rows = 2
    t_comp = flops / rows / chip_flops
    t_comm = psum_bytes / ici_bw + ici_lat
    return {
        "psum_bytes_per_iter_per_instance": psum_bytes,
        "flops_per_iter": flops,
        "t_compute_per_chip_s": t_comp,
        "t_psum_s": t_comm,
        "predicted_efficiency_rows2": round(t_comp / (t_comp + t_comm), 3),
        "note": "32x32/m=4096 per-iteration compute dwarfs the one (r, n) "
                "psum: row sharding is communication-cheap at this shape "
                "(the regime SCALING_r03 reserved it for)",
    }


def main():
    out = {
        "harness": "scripts/run_scaling_r04.py",
        "physical_cores": os.cpu_count(),
        "row_sharded_32x32": row_sharded_32(),
        "production_sharded_scaffold": production_sharded_point(),
        "communication_model_32x32": communication_model_32(),
        "carried_forward": "SCALING_r03.json (weak-scaling mesh points, "
                           "2-process parfor-model measurement, 16x16 "
                           "communication model) remains valid",
    }
    with open(os.path.join(ROOT, "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
