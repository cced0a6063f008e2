"""Pallas kernel correctness vs the cplx reference path (interpret mode on
CPU; the same kernels compile on TPU)."""

import numpy as np
import jax.numpy as jnp

from twoace_tpu.ops import cplx
from twoace_tpu.ops.pallas import (fused_prox_dual, fused_prox_dual_t,
                                   pair_matmul)


def _pair(rng, *shape):
    return cplx.Pair(jnp.asarray(rng.normal(size=shape), jnp.float32),
                     jnp.asarray(rng.normal(size=shape), jnp.float32))


def test_fused_prox_dual_matches_reference():
    rng = np.random.default_rng(0)
    m, r = 192, 24
    ax = _pair(rng, m, r)
    md = _pair(rng, m, r)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    mu = 0.31
    y, m_new = fused_prox_dual(ax, b, md, mu, block_rows=64, interpret=True)
    y_ref = cplx.magnitude_prox_rows(ax, b, md, mu)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.im), np.asarray(y_ref.im),
                               atol=1e-5)
    m_ref_re = md.re + mu * (ax.re - y_ref.re)
    m_ref_im = md.im + mu * (ax.im - y_ref.im)
    np.testing.assert_allclose(np.asarray(m_new.re), np.asarray(m_ref_re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_new.im), np.asarray(m_ref_im),
                               atol=1e-5)


def test_fused_prox_dual_ragged_rows():
    rng = np.random.default_rng(1)
    m, r = 100, 8           # not a multiple of the block size
    ax = _pair(rng, m, r)
    md = _pair(rng, m, r)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    y, _ = fused_prox_dual(ax, b, md, 0.5, block_rows=64, interpret=True)
    y_ref = cplx.magnitude_prox_rows(ax, b, md, 0.5)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)


def test_fused_prox_dual_t_matches_reference():
    rng = np.random.default_rng(3)
    r, m = 24, 192
    ax = _pair(rng, r, m)
    md = _pair(rng, r, m)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    mu = 0.31
    y, m_new = fused_prox_dual_t(ax, b, md, mu, block_cols=64,
                                 interpret=True)
    y_ref = cplx.magnitude_prox_cols(ax, b, md, mu)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.im), np.asarray(y_ref.im),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_new.re), np.asarray(md.re + mu * (ax.re - y_ref.re)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_new.im), np.asarray(md.im + mu * (ax.im - y_ref.im)),
        atol=1e-5)


def test_admm_iteration_pallas_prox_matches_xla_path():
    # the production transposed iteration with the fused Pallas prox+dual
    # (interpret mode) must track the plain XLA path exactly
    from twoace_tpu.ops.prox import profile_ladder

    rng = np.random.default_rng(4)
    nt = nr = 4
    n, m, r = nt * nr, 48, 6
    a = _pair(rng, m, n)
    u = np.linalg.inv((a.re + 1j * a.im).conj().T @ (a.re + 1j * a.im)
                      + np.eye(n))
    u_p = cplx.Pair(jnp.asarray(u.real, jnp.float32),
                    jnp.asarray(u.imag, jnp.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    ladder = profile_ladder(nt, nr, m, n, False)
    state = (_pair(rng, r, m), _pair(rng, r, n), _pair(rng, r, m),
             _pair(rng, r, n), jnp.asarray(0.2, jnp.float32),
             jnp.eye(2 * nr, dtype=jnp.float32))
    step_ref = cplx.admm_iteration_pair_t(a, b, u_p, nt, nr, ladder)
    step_pl = cplx.admm_iteration_pair_t(a, b, u_p, nt, nr, ladder,
                                         pallas_prox=True,
                                         pallas_interpret=True)
    out_ref = step_ref(state)
    out_pl = step_pl(state)
    for pr, pp in zip(out_ref[:4], out_pl[:4]):
        np.testing.assert_allclose(np.asarray(pp.re), np.asarray(pr.re),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pp.im), np.asarray(pr.im),
                                   atol=1e-5)


def test_pair_matmul_matches_reference():
    rng = np.random.default_rng(2)
    a = _pair(rng, 256, 192)
    b = _pair(rng, 192, 160)
    out = pair_matmul(a, b, tm=128, tn=128, tk=64, interpret=True)
    ref = cplx.matmul(a, b)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               atol=1e-3)
