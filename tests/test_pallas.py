"""Pallas kernel correctness vs the cplx reference path (interpret mode on
CPU; the same kernels compile on TPU)."""

import numpy as np
import jax.numpy as jnp

from twoace_tpu.ops import cplx
from twoace_tpu.ops.pallas import fused_prox_dual, pair_matmul


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
