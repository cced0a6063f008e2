#!/usr/bin/env python
"""Ablate the trans-pert hot loop to find the remaining bottleneck.

Variants: full | no-zprox | no-yprox | matmul-only, plus matmul precision
sweeps on the full step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NT = NR = 16
N = NT * NR
M = 4 * N
R = 20
BATCH = int(os.environ.get("BATCH", 256))
ITERS = 100
SHARED = os.environ.get("SHARED", "0") == "1"


def build(seed=0):
    from twoace_tpu.ops.prox import profile_ladder
    from twoace_tpu.ops.cplx import Pair

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (BATCH, M, N))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(N)
    x_true = (rng.normal(size=(BATCH, N))
              + 1j * rng.normal(size=(BATCH, N))) / np.sqrt(2)
    b = np.abs(np.einsum("umn,un->um", a, x_true))
    gram = np.einsum("umn,ump->unp", a.conj(), a) + np.eye(N)[None]
    u_mat = np.linalg.inv(gram)
    ladder = profile_ladder(NT, NR, M, N, False)

    def pair(x):
        return Pair(jnp.asarray(x.real, jnp.float32),
                    jnp.asarray(x.imag, jnp.float32))

    return pair(a), jnp.asarray(b, jnp.float32), pair(u_mat), ladder


def make_step(ladder, mode):
    from twoace_tpu.ops.cplx import (Pair, add, matmul, magnitude_prox_cols,
                                     _panel_spectral_prox)

    def build_step(a, b, u_mat):
        a_conj = Pair(a.re, -a.im)
        a_t = Pair(a.re.T, a.im.T)
        u_conj = Pair(u_mat.re, -u_mat.im)

        def step(state):
            y, z, m_dual, n_dual, mu, v_basis = state
            inv_mu = 1.0 / mu
            t = Pair(y.re - m_dual.re * inv_mu, y.im - m_dual.im * inv_mu)
            rhs = add(matmul(t, a_conj), Pair(z.re - n_dual.re * inv_mu,
                                              z.im - n_dual.im * inv_mu))
            x = matmul(rhs, u_conj)
            ax = matmul(x, a_t)
            if mode in ("full", "no-zprox"):
                y_new = magnitude_prox_cols(ax, b, m_dual, mu)
            else:
                y_new = ax
            if mode == "full":
                z_in = Pair(x.re + n_dual.re * inv_mu,
                            x.im + n_dual.im * inv_mu)
                e = Pair(z_in.re.reshape(R, NT, NR).transpose(2, 0, 1)
                         .reshape(NR, R * NT),
                         z_in.im.reshape(R, NT, NR).transpose(2, 0, 1)
                         .reshape(NR, R * NT))
                e_new, v_new = _panel_spectral_prox(e, NR, ladder, 1, v_basis,
                                                    eig_mode="perturb")
                z_new = Pair(e_new.re.reshape(NR, R, NT).transpose(1, 2, 0)
                             .reshape(R, NT * NR),
                             e_new.im.reshape(NR, R, NT).transpose(1, 2, 0)
                             .reshape(R, NT * NR))
            else:
                z_new, v_new = x, v_basis
            m_new = Pair(m_dual.re + mu * (ax.re - y_new.re),
                         m_dual.im + mu * (ax.im - y_new.im))
            n_new = Pair(n_dual.re + mu * (x.re - z_new.re),
                         n_dual.im + mu * (x.im - z_new.im))
            return (y_new, z_new, m_new, n_new, mu * 1.03, v_new)

        return step

    return build_step


def main():
    from twoace_tpu.ops.cplx import Pair

    a, b, u_mat, ladder = build()
    tp = lambda x: jnp.swapaxes(x, -1, -2)
    ones = Pair(jnp.ones((BATCH, R, N), jnp.float32),
                jnp.zeros((BATCH, R, N), jnp.float32))
    y0 = Pair(jnp.einsum("urn,umn->urm", ones.re, a.re),
              jnp.einsum("urn,umn->urm", ones.re, a.im))
    eye = jnp.broadcast_to(jnp.eye(2 * NR, dtype=jnp.float32),
                           (BATCH, 2 * NR, 2 * NR))
    zm = Pair(jnp.zeros((BATCH, R, M), jnp.float32),
              jnp.zeros((BATCH, R, M), jnp.float32))
    zn = Pair(jnp.zeros((BATCH, R, N), jnp.float32),
              jnp.zeros((BATCH, R, N), jnp.float32))
    mu0 = jnp.full((BATCH,), 1e-3, jnp.float32)
    state = (y0, ones, zm, zn, mu0, eye)

    def bench(mode, precision=None):
        build_step = make_step(ladder, mode)

        def run(a_, b_, u_, s):
            step = build_step(a_, b_, u_)

            def body(ss, _):
                return step(ss), None

            s, _ = jax.lax.scan(body, s, None, length=ITERS)
            return s

        if SHARED:
            vrun0 = jax.vmap(run, in_axes=(None, 0, None, 0))
            a0 = Pair(a.re[0], a.im[0])
            u0 = Pair(u_mat.re[0], u_mat.im[0])

            def vrun(a_, b_, u_, s):
                return vrun0(a0, b_, u0, s)
        else:
            vrun = jax.vmap(run, in_axes=(0, 0, 0, 0))

        def rr(a_, b_, u_, s):
            out = vrun(a_, b_, u_, s)
            return jnp.sum(out[0].re[:, 0, 0]) + jnp.sum(out[0].im[:, 0, 0])

        if precision:
            with jax.default_matmul_precision(precision):
                fn = jax.jit(rr)
                float(fn(a, b, u_mat, state))
        else:
            fn = jax.jit(rr)
            float(fn(a, b, u_mat, state))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(a, b, u_mat, state))
        dt = (time.perf_counter() - t0) / reps
        tag = f"{mode}" + (f"[{precision}]" if precision else "")
        print(f"{tag}: {BATCH * ITERS / dt:,.0f} iter/s ({dt*1e3:.1f} ms)",
              flush=True)

    for mode in ["full", "no-zprox", "no-yprox", "matmul-only"]:
        bench(mode)
    if not SHARED:
        for prec in ["bfloat16", "tensorfloat32", "float32"]:
            bench("full", prec)


if __name__ == "__main__":
    main()
