"""Pallas TPU kernels — BENCH-ONLY for the production float32 path.

Status (measured, round 5): the kernels win the batch-1 latency path only
in "default"-precision mode (−46 dB floor); the f32-capable megakernel
modes (``kernel_precision="split3"``/"highest", solver_kernel.py) are
convergence-class but LOSE to the XLA float32 route on device time
(48.4 vs 34.5 ms, BENCH_kernelprec_r05.json), and the per-op kernels
lose to XLA's batched small-matmul form at batch.  Production solvers
therefore default to the XLA path; everything here stays maintained for
benchmarking, ablation, and the default-precision latency mode.
"""
import os

import jax

from .kernels import (  # noqa: F401
    fused_prox_dual,
    fused_prox_dual_t,
    fused_zprox_batch,
    fused_zprox_t,
    pack_basis_w,
    pair_matmul,
    zprox_batch_group,
)


def pallas_default() -> bool:
    """Whether production solvers should route through the Pallas kernels.

    Default: ON on TPU backends, OFF elsewhere (the kernels compile only
    for TPU; CPU tests exercise them in interpret mode explicitly).
    Override with TWOACE_PALLAS=0/1.
    """
    env = os.environ.get("TWOACE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False
