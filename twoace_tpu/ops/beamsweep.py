"""Sector-level-sweep baseline (802.11ad SLS) with fine angle refinement.

TPU-native rewrite of ``MyBeamSweeping``
(ref: main/src/evaluate_plot_results/MyBeamSweeping.m:81-159): probe a
directional beam grid, pick the argmax-RSS (f, w) pair, then refine the
AoD/AoA estimate by scanning the winning beam's pattern on a fine angle
grid (the reference uses 0.005 deg steps, ref :134).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ArrayConfig
from ..models.steering import steering_vector
from ..sensing.codebooks import directional_beams_angular


class SweepResult(NamedTuple):
    f_best: jax.Array      #: (nt,) winning precoder
    w_best: jax.Array      #: (nr,) winning combiner
    aod_deg: jax.Array     #: refined AoD estimate
    aoa_deg: jax.Array     #: refined AoA estimate
    rss: jax.Array         #: (mt*mr,) the measured sweep


def _refine(beam, n: int, k_d: float, step_deg: float):
    """argmax_theta |beam^H a(theta)| over a fine grid (ref :134-153)."""
    angles = jnp.arange(-90.0, 90.0 + step_deg / 2, step_deg)
    a = steering_vector(jnp.sin(jnp.deg2rad(angles)), n, k_d)
    gain = jnp.abs(jnp.einsum("t,gt->g", jnp.conj(beam), a))
    return angles[jnp.argmax(gain)]


@partial(jax.jit, static_argnames=("cfg", "mt", "mr", "step_deg", "refine"))
def beam_sweep(measure_fn_output, f_set, w_set, cfg: ArrayConfig,
               mt: int, mr: int, step_deg: float = 0.05,
               refine: bool = True) -> SweepResult:
    """Pick the best (f, w) pair from sweep measurements and refine angles.

    ``measure_fn_output``: (mt*mr,) measured |y|^2 over the beam grid in
    Tx-major order; ``f_set``: (nt, mt); ``w_set``: (nr, mr).
    """
    p = jnp.argmax(measure_fn_output)
    ind_f = p // mr
    ind_w = p % mr
    f_best = f_set[:, ind_f]
    w_best = w_set[:, ind_w]
    if refine:
        aod = _refine(f_best, cfg.nt, cfg.k_d, step_deg)
        aoa = _refine(w_best, cfg.nr, cfg.k_d, step_deg)
    else:
        aod = jnp.asarray(0.0)
        aoa = jnp.asarray(0.0)
    return SweepResult(f_best=f_best, w_best=w_best, aod_deg=aod,
                       aoa_deg=aoa, rss=measure_fn_output)


def sweep_channel(key, vec_h, cfg: ArrayConfig, mt: int, mr: int,
                  aod_range: Tuple[float, float],
                  aoa_range: Tuple[float, float],
                  snr_db: float = jnp.inf) -> SweepResult:
    """End-to-end SLS on a synthetic channel: build the directional grid,
    measure |w^H H f|^2, sweep (ref :89-129)."""
    f_set, w_set = directional_beams_angular(mt, mr, cfg, aod_range,
                                             aoa_range)
    fw = jnp.einsum("ti,rj->ijtr", f_set, jnp.conj(w_set)) \
        .reshape(mt * mr, cfg.n)
    y = fw @ jnp.asarray(vec_h, fw.dtype)
    power = jnp.abs(y) ** 2
    if jnp.isfinite(snr_db):
        noise = 10.0 ** (-snr_db / 10.0)
        power = power + noise * jax.random.exponential(key, power.shape)
    return beam_sweep(power, f_set, w_set, cfg, mt, mr)
