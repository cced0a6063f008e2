"""2ACE-TPU: a TPU-native compressive mmWave channel-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
2ACE reference (gavinsyw/2ACE-mmWave-Channel-Estimation, MobiHoc '23):
magnitude-only (RSS) CSI recovery through analog beamforming codebooks, with
the spectral-profile ADMM solver family, PhaseLift/PLOMP/PLGAMP/CPRL
baselines, codebook generation/selection, evaluation, and mobility tracking.

Subpackages
-----------
- ``models``:   channel, dictionary, and measurement models (ref L3)
- ``ops``:      solvers and prox/eig kernels, incl. Pallas (ref L5)
- ``sensing``:  codebooks, sensing matrices, beam selection (ref L1/L4)
- ``parallel``: meshes, sharded solvers, multi-chip execution (new)
- ``pipeline``: end-to-end entry points — recovery, simulation, mobility,
                testbed orchestration (ref L2/L6)
- ``utils``:    metrics, units, PRNG, profiling, checkpointing
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import (  # noqa: F401
    AdmmConfig,
    ArrayConfig,
    ChannelConfig,
    MethodFlags,
    PhaseLiftConfig,
    SpectralProfileConfig,
    TwoStageConfig,
    probe_budget_grid,
)
