"""Sensing-matrix construction and beam selection.

TPU-native rewrite of:
  - ``Generate_Sensing_Matrix`` (mode dispatch over beam-pattern families)
    ref: main/src/generate_sensing_matrix/Generate_Sensing_Matrix.m:73-256
  - ``Generate_Sensing_Matrix_with_candidate`` (beam picking out of a given
    hardware codebook)
    ref: main/src/generate_sensing_matrix/Generate_Sensing_Matrix_with_candidate.m:1-45
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import math
import jax
import jax.numpy as jnp

from ..config import ArrayConfig
from .bayes_opt import bayes_a_opt_select
from .codebooks import (
    directional_beams_angular,
    directional_beams_spatial,
    random_sensing_rows,
)


class SensingMatrix(NamedTuple):
    f: jax.Array                #: (nt, mt) Tx beams (zeros for random mode)
    w: jax.Array                #: (U, nr, mr) Rx combiners — NOTE: stays zero
    #: in the Random_Phase_State mode, replicating the reference where the
    #: assignment is commented out (Generate_Sensing_Matrix.m:117) and hence
    #: the combiner-colored noise is zero for that mode.
    fw: jax.Array               #: (U, mt*mr, nt*nr) measurement rows
    measurement_mat: jax.Array  #: (U, mt*mr, P) = FW @ AD


def _kron_fw(f, w):
    """FW = kron(F^T, W^H): row (i, j) = kron(F[:, i]^T, W[:, j]^H), Tx-probe
    major, Rx antenna index fastest (ref: Generate_Sensing_Matrix.m:177)."""
    rows = jnp.einsum("ti,rj->ijtr", f, jnp.conj(w))
    mt, mr = f.shape[1], w.shape[1]
    return rows.reshape(mt * mr, -1)


def generate_sensing_matrix(key, method: str, mt: int, mr: int,
                            cfg: ArrayConfig, ad,
                            aod_range=None, aoa_range=None,
                            batch: int = 1,
                            prior_k=None) -> SensingMatrix:
    """Build sensing rows for a batch of U users/instances.

    Methods (ref: Generate_Sensing_Matrix.m:84-232):
      - ``"Random_Phase_State"``: each of the mt*mr rows is an independent
        uniform 2-bit phase vector of length nt*nr (ref :109-121); rows are
        prefix-stable in the measurement count.
      - ``"Directional_Beam"``: spatial-uniform directional beams (ref :169-179)
      - ``"Directional_Beam_Angular"``: angle-uniform sectors (ref :181-190)
      - ``"Random_Beam_Bayes"``: random candidates + Bayesian A-optimal
        row-exchange selection (ref :215-218, Bayes_Beam.m)
    """
    n = cfg.n
    ad = jnp.asarray(ad)
    m = mt * mr

    if method == "Random_Phase_State":
        def per_user(i):
            return random_sensing_rows(jax.random.fold_in(key, i), m, n,
                                       cfg.phase_bit)
        fw = jax.vmap(per_user)(jnp.arange(batch))
        f = jnp.zeros((cfg.nt, mt), fw.dtype)
        w = jnp.zeros((batch, cfg.nr, mr), fw.dtype)
    elif method in ("Directional_Beam", "Directional_Beam_Angular"):
        if aod_range is None:
            raise ValueError("directional modes need aod_range/aoa_range")
        if method == "Directional_Beam":
            span = float(aod_range[1] - aod_range[0])
            f, w_single = directional_beams_spatial(mt, mr, cfg, span)
        else:
            f, w_single = directional_beams_angular(mt, mr, cfg, aod_range,
                                                    aoa_range)
        fw_single = _kron_fw(f, w_single)
        fw = jnp.broadcast_to(fw_single[None], (batch, m, n))
        w = jnp.broadcast_to(w_single[None], (batch, cfg.nr, mr))
    elif method == "Random_Beam_Bayes":
        cand = random_sensing_rows(key, max(4 * m, 256), n, cfg.phase_bit)
        sel = bayes_a_opt_select(jax.random.fold_in(key, 1), cand, m,
                                 prior_k=prior_k)
        fw_single = cand[sel]
        fw = jnp.broadcast_to(fw_single[None], (batch, m, n))
        f = jnp.zeros((cfg.nt, mt), fw.dtype)
        w = jnp.zeros((batch, cfg.nr, mr), fw.dtype)
    else:
        raise ValueError(f"unknown sensing method: {method}")

    meas_mat = jnp.einsum("umn,np->ump", fw, ad.astype(fw.dtype))
    return SensingMatrix(f=f, w=w, fw=fw, measurement_mat=meas_mat)


def pick_beams(key, method: str, m: int, cb_train,
               prior_k=None) -> jax.Array:
    """Pick M beam indices out of a measured codebook.

    ref: Generate_Sensing_Matrix_with_candidate.m:1-45 —
    ``"Random_Phase_State"`` takes the first M rows (the codebook rows are
    already random, ref :12); ``"Bayes_Beam"`` runs A-optimal selection over
    a random candidate subset (ref :37-38, Bayes_Beam.m:1-15).
    """
    num = cb_train.shape[0]
    if method == "Random_Phase_State":
        return jnp.arange(m)
    if method == "Bayes_Beam":
        cand_size = min(num, 40000)
        cand_idx = jax.random.randint(key, (cand_size,), 0, num)
        cand = cb_train[cand_idx]
        sel = bayes_a_opt_select(jax.random.fold_in(key, 1), cand, m,
                                 prior_k=prior_k)
        return cand_idx[sel]
    raise ValueError(f"unknown beam-pick method: {method}")
