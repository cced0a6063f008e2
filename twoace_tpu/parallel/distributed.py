"""Multi-host initialization and scaling benchmark harness.

The reference scales by adding MATLAB parfor workers on one machine
(ref: Vs_M_par.m:145); the TPU-native story is a pod slice: per-host
processes joined with ``jax.distributed.initialize``, a global (batch x
rows) mesh over all devices, batch sharded across hosts over DCN and rows
within a host over ICI.

Also provides the scaling-efficiency harness used by the BASELINE targets
(recoveries/s at 1 chip vs N devices, efficiency = speedup / N).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import AdmmConfig
from .mesh import make_mesh, problem_sharding
from .sharded_admm import solve_lowrank_sharded


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join a multi-host run.  No-op when running single-process.

    On Cloud TPU pods the three arguments auto-detect from the metadata
    server; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def _sync_scalar(x) -> float:
    """Host readback — the only reliable barrier on tunneled TPU runtimes."""
    return float(np.asarray(jax.device_get(x)))


@dataclasses.dataclass
class ScalingPoint:
    devices: int
    recoveries_per_s: float
    speedup: float
    efficiency: float


def scaling_benchmark(nt: int = 8, nr: int = 8, m: int = 256,
                      batch_per_device: int = 4,
                      device_counts=None,
                      cfg: AdmmConfig = AdmmConfig(maxiter=100),
                      reps: int = 2) -> Dict[int, ScalingPoint]:
    """Weak-scaling benchmark of the sharded solver.

    For each device count d, solve ``batch_per_device * d`` independent
    recoveries over a (d x 1) mesh and report throughput; efficiency is
    throughput(d) / (d * throughput(1)).
    """
    n = nt * nr
    key = jax.random.PRNGKey(0)
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = sorted({1, 2, len(all_devices)})
    out: Dict[int, ScalingPoint] = {}
    base = None
    for d in device_counts:
        if d > len(all_devices):
            continue
        mesh = make_mesh(batch=d, rows=1, devices=all_devices[:d])
        batch = batch_per_device * d
        bits = jax.random.randint(key, (batch, m, n), 0, 4)
        a = jnp.exp(1j * bits * (np.pi / 2)).astype(jnp.complex64) \
            / np.sqrt(n)
        x_true = (jax.random.normal(jax.random.fold_in(key, 1), (batch, n))
                  + 0j).astype(jnp.complex64)
        b = jnp.abs(jnp.einsum("umn,un->um", a, x_true))
        a_sh, b_sh = problem_sharding(mesh)
        a = jax.device_put(a, a_sh)
        b = jax.device_put(b, b_sh)

        x = solve_lowrank_sharded(mesh, a, b, nt, nr, cfg)
        _sync_scalar(jnp.abs(x[0, 0]))          # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            x = solve_lowrank_sharded(mesh, a, b, nt, nr, cfg)
            _sync_scalar(jnp.abs(x[0, 0]))
        dt = (time.perf_counter() - t0) / reps
        rate = batch / dt
        if base is None:
            base = rate / d                      # per-device baseline rate
        speedup = rate / base
        out[d] = ScalingPoint(devices=d, recoveries_per_s=rate,
                              speedup=speedup,
                              efficiency=speedup / d)
    return out
