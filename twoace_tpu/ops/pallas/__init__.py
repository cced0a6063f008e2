from .kernels import fused_prox_dual, pair_matmul  # noqa: F401
