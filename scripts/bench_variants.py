#!/usr/bin/env python
"""Compare hot-loop variants on the real chip:

  orig      — admm_iteration_pair, warm Jacobi (sweeps=1)  [current bench]
  trans     — admm_iteration_pair_t (r-leading layout), warm Jacobi sweeps=1
  trans-pert— admm_iteration_pair_t, perturbative eigenbasis update

Prints one line per variant: name, iters/s.
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
BATCH = 256
ITERS = 100


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


def timeit(fn, *args):
    float(fn(*args))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    from twoace_tpu.ops.cplx import (Pair, admm_iteration_pair,
                                     admm_iteration_pair_t, matmul)

    a, b, u_mat, ladder = build()
    ones = Pair(jnp.ones((BATCH, N, R), jnp.float32),
                jnp.zeros((BATCH, N, R), jnp.float32))
    y0 = jax.vmap(matmul)(a, ones)
    eye = jnp.broadcast_to(jnp.eye(2 * NR, dtype=jnp.float32),
                           (BATCH, 2 * NR, 2 * NR))
    zeros_m = Pair(jnp.zeros((BATCH, M, R), jnp.float32),
                   jnp.zeros((BATCH, M, R), jnp.float32))
    zeros_n = Pair(jnp.zeros((BATCH, N, R), jnp.float32),
                   jnp.zeros((BATCH, N, R), jnp.float32))
    mu0 = jnp.full((BATCH,), 1e-3, jnp.float32)

    state_o = (y0, ones, zeros_m, zeros_n, mu0, eye)

    def tp(p):
        return Pair(jnp.swapaxes(p.re, -1, -2), jnp.swapaxes(p.im, -1, -2))

    state_t = (tp(y0), tp(ones), tp(zeros_m), tp(zeros_n), mu0, eye)

    variants = {}

    def make(build_step, state):
        def run(a_, b_, u_, s):
            step = build_step(a_, b_, u_)

            def body(ss, _):
                return step(ss), None

            s, _ = jax.lax.scan(body, s, None, length=ITERS)
            return s

        vrun = jax.vmap(run, in_axes=(0, 0, 0, 0))

        def rr(a_, b_, u_, s):
            out = vrun(a_, b_, u_, s)
            y = out[0]
            return jnp.sum(y.re[:, 0, 0]) + jnp.sum(y.im[:, 0, 0])

        return jax.jit(rr), state

    def make_shared(build_step, state):
        """Shared codebook across the batch: A/U unbatched, state batched.
        XLA folds (batch, r) into the matmul M dimension -> full MXU."""
        def run(a_, b_, u_, s):
            step = build_step(a_, b_, u_)

            def body(ss, _):
                return step(ss), None

            s, _ = jax.lax.scan(body, s, None, length=ITERS)
            return s

        vrun = jax.vmap(run, in_axes=(None, 0, None, 0))

        def rr(a_, b_, u_, s):
            out = vrun(a_, b_, u_, s)
            y = out[0]
            return jnp.sum(y.re[:, 0, 0]) + jnp.sum(y.im[:, 0, 0])

        a0 = Pair(a.re[0], a.im[0])
        u0 = Pair(u_mat.re[0], u_mat.im[0])
        return jax.jit(lambda b_, s: rr(a0, b_, u0, s)), state

    which = sys.argv[1:] or ["orig", "trans", "trans-pert"]
    if "orig" in which:
        variants["orig"] = make(
            lambda a_, b_, u_: admm_iteration_pair(
                a_, b_, u_, NT, NR, ladder, sweeps=1, warm_basis=True),
            state_o)
    if "trans" in which:
        variants["trans"] = make(
            lambda a_, b_, u_: admm_iteration_pair_t(
                a_, b_, u_, NT, NR, ladder, sweeps=1, eig_mode="jacobi"),
            state_t)
    if "trans-pert" in which:
        variants["trans-pert"] = make(
            lambda a_, b_, u_: admm_iteration_pair_t(
                a_, b_, u_, NT, NR, ladder, eig_mode="perturb"),
            state_t)

    if "shared" in which:
        variants["shared-pert"] = make_shared(
            lambda a_, b_, u_: admm_iteration_pair_t(
                a_, b_, u_, NT, NR, ladder, eig_mode="perturb"),
            state_t)
        variants["shared-jac"] = make_shared(
            lambda a_, b_, u_: admm_iteration_pair_t(
                a_, b_, u_, NT, NR, ladder, sweeps=1, eig_mode="jacobi"),
            state_t)

    for name, (fn, st) in variants.items():
        if name.startswith("shared"):
            dt = timeit(fn, b, st)
        else:
            dt = timeit(fn, a, b, u_mat, st)
        print(f"{name}: {BATCH * ITERS / dt:,.0f} iter/s   ({dt*1e3:.1f} ms/call)",
              flush=True)


if __name__ == "__main__":
    main()
