#!/usr/bin/env python
"""Bottleneck breakdown of the fused ADMM iteration on the real TPU.

Times three variants of the bench.py workload (same shapes/batch):
  - full:     X/Y/Z/dual updates, Jacobi sweeps = 4 (the bench config)
  - sweeps1:  Z-prox with a single Jacobi sweep
  - no_zprox: matmuls + magnitude prox + duals only (Z passthrough)

Prints one JSON line per variant.  Compile of each variant is independent;
run in the background (remote compile can take tens of minutes cold).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench as B


def make_step_variant(ladder, sweeps, use_zprox):
    from twoace_tpu.ops.cplx import (
        Pair, add, magnitude_prox_rows, matmul, spectral_profile_prox_pair,
    )

    def run(a, b, u_mat, state):
        ah = Pair(jnp.swapaxes(a.re, -1, -2), -jnp.swapaxes(a.im, -1, -2))

        def step(state):
            y, z, m_dual, n_dual, mu = state
            inv_mu = 1.0 / mu
            t = Pair(y.re - m_dual.re * inv_mu, y.im - m_dual.im * inv_mu)
            rhs = add(matmul(ah, t), Pair(z.re - n_dual.re * inv_mu,
                                          z.im - n_dual.im * inv_mu))
            x = matmul(u_mat, rhs)
            ax = matmul(a, x)
            y_new = magnitude_prox_rows(ax, b, m_dual, mu)
            z_in = Pair(x.re + n_dual.re * inv_mu, x.im + n_dual.im * inv_mu)
            if use_zprox:
                z_new = spectral_profile_prox_pair(z_in, B.NT, B.NR, ladder,
                                                   sweeps=sweeps)
            else:
                z_new = z_in
            m_new = Pair(m_dual.re + mu * (ax.re - y_new.re),
                         m_dual.im + mu * (ax.im - y_new.im))
            n_new = Pair(n_dual.re + mu * (x.re - z_new.re),
                         n_dual.im + mu * (x.im - z_new.im))
            return (y_new, z_new, m_new, n_new, mu * 1.03)

        def body(s, _):
            return step(s), None

        state, _ = jax.lax.scan(body, state, None, length=B.ITERS)
        return state

    vrun = jax.vmap(run, in_axes=(0, 0, 0, 0))

    def run_and_reduce(a, b, u_mat, state):
        out = vrun(a, b, u_mat, state)
        return jnp.sum(out[0].re[:, 0, 0]) + jnp.sum(out[0].im[:, 0, 0])

    return jax.jit(run_and_reduce)


def main():
    from twoace_tpu.ops.cplx import Pair, matmul

    a, b, u_mat, ladder = B.build_problem()
    ones = Pair(jnp.ones((B.BATCH, B.N, B.R), jnp.float32),
                jnp.zeros((B.BATCH, B.N, B.R), jnp.float32))
    y0 = jax.vmap(matmul)(a, ones)
    zeros_m = Pair(jnp.zeros((B.BATCH, B.M, B.R), jnp.float32),
                   jnp.zeros((B.BATCH, B.M, B.R), jnp.float32))
    zeros_n = Pair(jnp.zeros((B.BATCH, B.N, B.R), jnp.float32),
                   jnp.zeros((B.BATCH, B.N, B.R), jnp.float32))
    state = (y0, ones, zeros_m, zeros_n,
             jnp.full((B.BATCH,), 1e-3, jnp.float32))

    for name, sweeps, use_z in (("full_s4", 4, True),
                                ("sweeps1", 1, True),
                                ("no_zprox", 0, False)):
        step = make_step_variant(ladder, max(sweeps, 1), use_z)
        t0 = time.perf_counter()
        float(step(a, b, u_mat, state))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(step(a, b, u_mat, state))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "variant": name,
            "iters_per_s": round(B.BATCH * B.ITERS / dt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
