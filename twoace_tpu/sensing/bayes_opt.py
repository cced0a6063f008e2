"""Bayesian A-optimal beam (row) selection.

TPU-native rewrite of the reference's row-exchange A-optimality minimization
with rank-1 Sherman-Morrison updates:
  ref: main/src/bayes_opt/bayesAopt_complex.m:105-240 (core loop :187-229)
  ref: main/src/generate_sensing_matrix/Bayes_Beam.m:1-15 (candidate draw)

Objective: choose M rows X out of a candidate set C to minimize
``trace(A * inv(X'X + K))`` (A = weight matrix, K = prior precision).  The
greedy exchange removes one design row, evaluates the trace delta of adding
every candidate via Sherman-Morrison, and keeps the best swap.

The per-row step is a (n, n) x (n, C) matmul — MXU-friendly — and the whole
selection is one jitted ``lax.fori_loop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("m", "sweeps"))
def bayes_a_opt_select(key, candidates, m: int, prior_k=None,
                       weight_a=None, sweeps: int = 2):
    """Select ``m`` row indices from ``candidates`` (C, n).

    ``prior_k``: prior precision K (default I, as used by Bayes_Beam.m:13);
    ``weight_a``: A-criterion weight (default I).
    Returns int32 indices of shape (m,).
    """
    cand = jnp.asarray(candidates)
    c_count, n = cand.shape
    dtype = cand.dtype
    if prior_k is None:
        prior_k = jnp.eye(n, dtype=dtype)
    else:
        prior_k = jnp.asarray(prior_k, dtype)
    if weight_a is None:
        weight_a = jnp.eye(n, dtype=dtype)
    else:
        weight_a = jnp.asarray(weight_a, dtype)

    # random initial design (ref: bayesAopt_complex.m:127-128)
    rowlist = jax.random.randint(key, (m,), 0, c_count)
    x0 = cand[rowlist]
    minv = jnp.linalg.inv(jnp.conj(x0.T) @ x0 + prior_k)
    ch = jnp.conj(cand)

    def step(i, carry):
        minv, rowlist = carry
        row = i % m
        x = cand[rowlist[row]]
        # remove row: Ninv = Minv + w u u^H  (ref :145-146)
        u = minv @ x
        w = 1.0 / jnp.maximum(jnp.real(1.0 - jnp.vdot(x, u)), 1e-12)
        ninv = minv + w * jnp.outer(u, jnp.conj(u))
        # addition deltas for every candidate (ref :166-171):
        #   trace(A (Ninv - w_i u_i u_i^H)) = trace(A Ninv) - w_i u_i^H A u_i
        u_all = ninv @ cand.T                     # (n, C); u_i = Ninv x_i
        denom = 1.0 + jnp.real(jnp.sum(ch.T * u_all, axis=0))
        w_all = 1.0 / jnp.maximum(denom, 1e-12)
        au = weight_a @ u_all
        quad = jnp.real(jnp.sum(jnp.conj(u_all) * au, axis=0))
        score = -w_all * quad                     # lower = better design
        idx = jnp.argmin(score)
        # commit the best swap (always: first sweep forces placement,
        # ref :225 "rowlist(row) == 0")
        u_i = u_all[:, idx]
        w_i = w_all[idx]
        minv_new = ninv - w_i * jnp.outer(u_i, jnp.conj(u_i))
        rowlist = rowlist.at[row].set(idx.astype(rowlist.dtype))
        return (minv_new, rowlist)

    minv, rowlist = lax.fori_loop(0, sweeps * m, step, (minv, rowlist))
    return rowlist


def prior_from_channel(h_matrix, cfg, n_grid: int,
                       aod_range=(-47.5, 47.5)):
    """Diagonal prior K from a channel estimate: K_ii = |H w(theta_i)|^{-1/2}.

    ref: main/src/bayes_opt/find_K.m:1-13.
    """
    from ..models.steering import steering_vector

    aod = jnp.linspace(aod_range[0], aod_range[1], n_grid)
    w = steering_vector(jnp.sin(jnp.deg2rad(aod)), cfg.nt, cfg.k_d)  # (g, nt)
    gain = jnp.abs(jnp.einsum("rt,gt->gr", h_matrix, w))
    vec_k = jnp.sqrt(jnp.mean(gain, axis=-1)) ** -1.0
    return jnp.diag(vec_k.astype(jnp.complex64))
