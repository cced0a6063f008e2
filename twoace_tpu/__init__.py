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


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    The staged batch solver is a large XLA graph: a truly cold compile
    costs minutes on-chip (and far more through a remote-compile tunnel —
    see COMPILE_r03.json at the repo root for the measured breakdown).
    With this cache every shape is paid for once per machine, ever; warm
    re-runs load in seconds.  Opt out with ``TWOACE_NO_COMPILE_CACHE=1``;
    override the location with ``TWOACE_CACHE_DIR`` or by setting
    ``jax_compilation_cache_dir`` yourself before importing this package
    (an existing setting is never clobbered).
    """
    import os

    if os.environ.get("TWOACE_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        if (jax.config.jax_compilation_cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return
        cache = os.environ.get("TWOACE_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "twoace_tpu", "xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:  # pragma: no cover - cache is best-effort only
        pass


_enable_persistent_compile_cache()

from . import config  # noqa: F401,E402
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
