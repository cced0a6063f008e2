#!/usr/bin/env python
"""Benchmark: 2ACE ADMM iteration throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "admm_iters_per_s", "value": N, "unit": "iter/s", "vs_baseline": N}

Workload: the reference's hot loop at its production shape — 16x16 CSI
(n = 256), m = 1024 probes, over-parameterization r = 20 — X-update matmul
against precomputed inv(A'A+I), magnitude prox, spectral-profile Z-prox
(Gram eigendecomposition + constraint ladder), dual updates
(ref: inferLowRankV4_multi.m:318-341).  BATCH independent recoveries
(distinct channels / measurement vectors) run concurrently against ONE
shared probing codebook — exactly the testbed's production setting, where
every repeat/restart measures through the same physical .brd codebook
(ref: main/main.py:426-440 reuses one flashed codebook for all 40 repeats).

TPU-native specifics (see twoace_tpu/ops/cplx.py):
  - complex matrices are carried as (re, im) float32 pairs; every matmul is
    a 3M-Karatsuba set of real MXU matmuls (this runtime has no complex
    dtype support, and the MXU is real-valued regardless)
  - TRANSPOSED state layout: the over-parameterization axis r=20 leads, so
    the MXU lane dimension is always n or m, never the thin r — and with
    the codebook shared, XLA folds (batch, r) into one tall matmul M
    dimension, saturating the systolic array instead of paying its
    ~128-cycle pipeline fill per 20-row slab
  - the Z-prox eigenbasis is carried across iterations and refined by a
    first-order perturbative update (skew correction + Newton-Schulz,
    ~5 small matmuls) instead of re-running a full eigendecomposition
  - timing forces a scalar host readback per repetition: on tunneled/async
    TPU runtimes ``block_until_ready`` returns before remote execution
    finishes, so device-side sync alone under-reports wall time

Baseline: MATLAB solves a 16x16 recovery in < ~1 s (README.md:87) at an
iteration budget of up to ~4000 ADMM iterations per (M, method) cell
(SURVEY §3.2), i.e. roughly 4000 iterations/s on a laptop CPU.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persist compiled executables: the remote-compile tunnel takes tens of
# minutes for this graph cold; a warm cache makes re-runs near-instant.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MATLAB_BASELINE_ITERS_PER_S = 4000.0

NT = NR = 16
N = NT * NR
M = 4 * N
R = 20
BATCH = 256         # independent recoveries through one shared codebook
ITERS = 100         # scanned ADMM iterations per timed call


def build_problem(seed: int = 0):
    """Problem data in pair representation, built host-side with numpy."""
    from twoace_tpu.ops.prox import profile_ladder
    from twoace_tpu.ops.cplx import Pair

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (M, N))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(N)        # shared codebook
    x_true = (rng.normal(size=(BATCH, N))
              + 1j * rng.normal(size=(BATCH, N))) / np.sqrt(2)
    b = np.abs(np.einsum("mn,un->um", a, x_true))
    u_mat = np.linalg.inv(a.conj().T @ a + np.eye(N))
    ladder = profile_ladder(NT, NR, M, N, False)

    def pair(x):
        return Pair(jnp.asarray(x.real, jnp.float32),
                    jnp.asarray(x.imag, jnp.float32))

    return (pair(a), jnp.asarray(b, jnp.float32), pair(u_mat), ladder)


def make_step(a, u_mat, ladder):
    from twoace_tpu.ops.cplx import admm_iteration_pair_t

    # opt-in: fuse the magnitude prox + M-dual update into one Pallas VMEM
    # pass (twoace_tpu/ops/pallas/kernels.py::fused_prox_dual_t)
    pallas_prox = os.environ.get("TWOACE_BENCH_PALLAS_PROX") == "1"

    def run(b, state):
        step = admm_iteration_pair_t(a, b, u_mat, NT, NR, ladder,
                                     eig_mode="perturb",
                                     pallas_prox=pallas_prox)

        def body(s, _):
            return step(s), None

        state, _ = jax.lax.scan(body, state, None, length=ITERS)
        return state

    # codebook shared across the batch: XLA folds (batch, r) into the
    # matmul streaming dimension
    vrun = jax.vmap(run, in_axes=(0, 0))

    def run_and_reduce(b, state):
        out = vrun(b, state)
        y = out[0]
        return jnp.sum(y.re[:, 0, 0]) + jnp.sum(y.im[:, 0, 0])

    return jax.jit(run_and_reduce)


def main():
    from twoace_tpu.ops.cplx import Pair, matmul, panel_gram_basis_pair

    a, b, u_mat, ladder = build_problem()
    ones = Pair(jnp.ones((BATCH, R, N), jnp.float32),
                jnp.zeros((BATCH, R, N), jnp.float32))
    a_t = Pair(a.re.T, a.im.T)
    y0 = jax.vmap(lambda p: matmul(p, a_t))(ones)

    def seed_basis(z):
        e = Pair(z.re.reshape(R, NT, NR).transpose(2, 0, 1).reshape(NR, R * NT),
                 z.im.reshape(R, NT, NR).transpose(2, 0, 1).reshape(NR, R * NT))
        return panel_gram_basis_pair(e)[1]

    basis0 = jax.vmap(seed_basis)(ones)
    state = (y0, ones,
             Pair(jnp.zeros((BATCH, R, M), jnp.float32),
                  jnp.zeros((BATCH, R, M), jnp.float32)),
             Pair(jnp.zeros((BATCH, R, N), jnp.float32),
                  jnp.zeros((BATCH, R, N), jnp.float32)),
             jnp.full((BATCH,), 1e-3, jnp.float32),
             basis0)
    step = make_step(a, u_mat, ladder)

    # compile + warmup; float() forces a host readback (true synchronization)
    float(step(b, state))

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(step(b, state))
    dt = (time.perf_counter() - t0) / reps

    iters_per_s = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "admm_iters_per_s",
        "value": round(iters_per_s, 1),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / MATLAB_BASELINE_ITERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
