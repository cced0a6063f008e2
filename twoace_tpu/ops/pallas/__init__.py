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
