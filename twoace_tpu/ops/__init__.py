from .admm import AdmmResult, infer_admm, solve_lowrank_multi, solve_minl2  # noqa: F401
from .eigh_jacobi import eigh_desc, eigh_jacobi, subspace_eigh  # noqa: F401
from .prox import (  # noqa: F401
    magnitude_prox,
    nuclear_prox,
    profile_ladder,
    project_rows_to_magnitude,
    spectral_profile_prox,
)
from .phaselift import (  # noqa: F401
    PairPhaseLiftResult,
    PhaseLiftResult,
    phaselift_bm,
    phaselift_bm_pair,
    phaselift_fista,
)
from .pair_solver import (  # noqa: F401
    PairAdmmResult,
    infer_admm_pair,
    solve_lowrank_multi_pair,
    solve_lowrank_multi_pair_batch,
    spectral_initialize_pair,
)
from .gamp import embgamp, gamp, prgamp, vamp, vamp_cs  # noqa: F401
from .spectral_init import spectral_initialize  # noqa: F401
