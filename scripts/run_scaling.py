#!/usr/bin/env python
"""Produce SCALING_r{N}.json: weak-scaling efficiency of the sharded solver.

Runs ``twoace_tpu.parallel.distributed.scaling_benchmark`` over an
8-virtual-device CPU mesh (xla_force_host_platform_device_count) — the
same harness a TPU pod slice would use, with the mesh swapped for real
chips.  The reference's scale-out analog is the MATLAB parfor pool
(ref: Numerical_Simulation/main_programs/Vs_M_par.m:145), whose speedup
is implicit and never recorded.

HONESTY NOTE (recorded in the artifact): this machine has a small number
of physical cores, so >cores virtual devices oversubscribe the CPU and
the measured efficiency at high device counts reflects core contention,
not ICI/collective overhead.  The artifact proves the harness + sharded
collectives execute and records the curve; efficiency at device counts
<= physical cores is the meaningful subset.

Usage: python scripts/run_scaling.py [--devices 8] [--out SCALING_r02.json]
"""

import argparse
import dataclasses
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--out", default="SCALING_r02.json")
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.parallel.distributed import scaling_benchmark

    counts = sorted({1, 2, 4, args.devices})
    points = scaling_benchmark(
        device_counts=[c for c in counts if c <= args.devices],
        batch_per_device=args.batch_per_device,
        cfg=AdmmConfig(maxiter=args.maxiter),
        reps=args.reps)

    physical = os.cpu_count()
    out = {
        "harness": "twoace_tpu.parallel.distributed.scaling_benchmark",
        "mesh": "virtual CPU devices (xla_force_host_platform_device_count)",
        "physical_cores": physical,
        "caveat": (
            "virtual devices share the physical cores; efficiency at "
            f"device counts > {physical} measures core oversubscription, "
            "not collective overhead. Meaningful subset: devices <= cores."),
        "workload": {
            "nt": 8, "nr": 8, "m": 256,
            "batch_per_device": args.batch_per_device,
            "maxiter": args.maxiter,
        },
        "points": [dataclasses.asdict(p) for p in points.values()],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["points"]))


if __name__ == "__main__":
    main()
