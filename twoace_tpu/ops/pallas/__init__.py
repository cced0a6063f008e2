from .kernels import (  # noqa: F401
    fused_prox_dual,
    fused_prox_dual_t,
    pair_matmul,
)
