#!/usr/bin/env python
"""Bottleneck breakdown + MFU/roofline estimate of the ADMM iteration.

Times variants of the bench.py kernel-loop workload (production transposed
layout, batch 256, shared codebook) on the real TPU:

  - full_xla:     X/Y/Z/dual updates, JAX (XLA-batched) Z-prox
  - full_pallas:  same, fused Pallas Z-prox + prox/dual kernels
  - no_zprox:     matmuls + magnitude prox + duals only (Z passthrough)
  - matmul_only:  the three Karatsuba pair matmuls only

and derives an analytic FLOP count per iteration, MFU against the chip's
bf16 MXU peak (fp32 operands are emulated with multi-pass bf16 passes on
this hardware, so fp32 MFU > the reported bf16-peak number), and a rough
HBM-traffic roofline check.

Writes BENCH_breakdown.json at the repo root and prints one JSON line per
variant.  Run on the TPU host; first compiles can take minutes cold.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
import bench as B  # noqa: E402

# TPU v5e (lite) single-chip peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def flops_per_iter():
    """Analytic real-FLOP count of one fused transposed-pair iteration."""
    r, m, n, nr, nt = B.R, B.M, B.N, B.NR, B.NT
    # Karatsuba complex matmul = 3 real matmuls (2*M*K*N each)
    mm = lambda a, b, c: 3 * 2 * a * b * c
    fl = mm(r, m, n)          # t @ conj(A)        (r,m)@(m,n)
    fl += mm(r, n, n)         # rhs @ conj(U)      (r,n)@(n,n)
    fl += mm(r, n, m)         # x @ A^T            (r,n)@(n,m)
    # Z-prox: Gram + delta apply on the (nr, r*nt) panel + ~8 (nr,nr) mats
    fl += 2 * mm(nr, r * nt, nr)
    fl += 8 * mm(nr, nr, nr)
    # elementwise prox/dual work is negligible (~10 * r * m flops)
    return fl


def make_step_variant(a, u_mat, ladder, mode: str):
    from twoace_tpu.ops.cplx import (Pair, admm_iteration_batch,
                                     admm_iteration_pair_t,
                                     magnitude_prox_cols, matmul)

    a_conj = Pair(a.re, -a.im)
    a_t = Pair(a.re.T, a.im.T)
    u_conj = Pair(u_mat.re, -u_mat.im)

    if mode in ("batchz_pallas", "batchz_xla"):
        # hand-batched step (no vmap): lane-packed block-diagonal Z-prox
        # kernel vs the vmapped XLA chain, same everything else
        def run_batched(b, state):
            step_b = admm_iteration_batch(
                a, b, u_mat, B.NT, B.NR, ladder,
                zprox_mode=("pallas_batch" if mode == "batchz_pallas"
                            else "xla"))

            def body(s, _):
                return step_b(s), None

            state, _ = jax.lax.scan(body, state, None, length=B.ITERS)
            return jnp.sum(state[0].re[:, 0, 0]) + jnp.sum(state[0].im[:, 0, 0])

        return jax.jit(run_batched)

    def run(b, state):
        if mode in ("full_xla", "full_pallas"):
            step = admm_iteration_pair_t(
                a, b, u_mat, B.NT, B.NR, ladder, eig_mode="perturb",
                pallas_prox=(mode == "full_pallas"),
                pallas_zprox=(mode == "full_pallas"))
        else:
            def step(state):
                y, z, m_dual, n_dual, mu, v = state
                inv_mu = 1.0 / mu
                t = Pair(y.re - m_dual.re * inv_mu,
                         y.im - m_dual.im * inv_mu)
                rhs = Pair(z.re - n_dual.re * inv_mu,
                           z.im - n_dual.im * inv_mu)
                k1 = matmul(t, a_conj)
                rhs = Pair(k1.re + rhs.re, k1.im + rhs.im)
                x = matmul(rhs, u_conj)
                ax = matmul(x, a_t)
                if mode == "no_zprox":
                    y_new = magnitude_prox_cols(ax, b, m_dual, mu)
                else:                       # matmul_only
                    y_new = ax
                m_new = Pair(m_dual.re + mu * (ax.re - y_new.re),
                             m_dual.im + mu * (ax.im - y_new.im))
                return (y_new, x, m_new, n_dual, mu * 1.03, v)

        def body(s, _):
            return step(s), None

        state, _ = jax.lax.scan(body, state, None, length=B.ITERS)
        return state

    vrun = jax.vmap(run, in_axes=(0, 0))

    def run_and_reduce(b, state):
        out = vrun(b, state)
        return jnp.sum(out[0].re[:, 0, 0]) + jnp.sum(out[0].im[:, 0, 0])

    return jax.jit(run_and_reduce)


def main():
    from twoace_tpu.ops.cplx import Pair, matmul, panel_gram_basis_pair

    a, b, u_mat, ladder = B.build_problem()
    ones = Pair(jnp.ones((B.BATCH, B.R, B.N), jnp.float32),
                jnp.zeros((B.BATCH, B.R, B.N), jnp.float32))
    a_t = Pair(a.re.T, a.im.T)
    y0 = jax.vmap(lambda p: matmul(p, a_t))(ones)

    def seed_basis(z):
        e = Pair(
            z.re.reshape(B.R, B.NT, B.NR).transpose(2, 0, 1).reshape(
                B.NR, B.R * B.NT),
            z.im.reshape(B.R, B.NT, B.NR).transpose(2, 0, 1).reshape(
                B.NR, B.R * B.NT))
        return panel_gram_basis_pair(e)[1]

    basis0 = jax.vmap(seed_basis)(ones)
    state = (y0, ones,
             Pair(jnp.zeros((B.BATCH, B.R, B.M), jnp.float32),
                  jnp.zeros((B.BATCH, B.R, B.M), jnp.float32)),
             Pair(jnp.zeros((B.BATCH, B.R, B.N), jnp.float32),
                  jnp.zeros((B.BATCH, B.R, B.N), jnp.float32)),
             jnp.full((B.BATCH,), 1e-3, jnp.float32),
             basis0)

    from twoace_tpu.ops.pallas.kernels import pack_basis_w

    # hand-batched variants: mu (B, 1, 1); basis packed block-diagonal
    state_bz = (state[0], state[1], state[2], state[3],
                state[4][:, None, None], pack_basis_w(basis0, B.NR))
    state_bx = (state[0], state[1], state[2], state[3],
                state[4][:, None, None], basis0)

    fl = flops_per_iter()
    # min HBM traffic per iteration per instance (fp32 pairs): read+write
    # y, m (r x m), z, n (r x n); A and U stay resident across the batch
    state_bytes = 4 * 2 * 2 * (B.R * B.M + B.R * B.N) * 2
    results = {}
    for name in ("full_xla", "full_pallas", "no_zprox", "matmul_only",
                 "batchz_xla", "batchz_pallas"):
        step = make_step_variant(a, u_mat, ladder, name)
        st = {"batchz_pallas": state_bz, "batchz_xla": state_bx}.get(
            name, state)
        t0 = time.perf_counter()
        float(step(b, st))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(step(b, st))
        dt = (time.perf_counter() - t0) / reps
        rate = B.BATCH * B.ITERS / dt
        entry = {
            "iters_per_s": round(rate, 1),
            "tflops": round(rate * fl / 1e12, 2),
            "mfu_vs_bf16_peak": round(rate * fl / 1e12
                                      / PEAK_BF16_TFLOPS, 4),
            "hbm_gbps_state_only": round(rate * state_bytes / 1e9, 1),
            "compile_s": round(compile_s, 1),
        }
        results[name] = entry
        print(json.dumps({"variant": name, **entry}), flush=True)

    out = {
        "workload": {"nt": B.NT, "nr": B.NR, "m": B.M, "r": B.R,
                     "batch": B.BATCH, "iters": B.ITERS},
        "flops_per_iter": fl,
        "state_bytes_per_iter": state_bytes,
        "peaks": {"bf16_tflops": PEAK_BF16_TFLOPS,
                  "hbm_gbps": PEAK_HBM_GBS},
        "note": ("fp32 matmuls are emulated via multi-pass bf16 on this "
                 "MXU, so achievable fp32 peak is ~peak/3; mfu_vs_bf16_peak "
                 "is against the raw bf16 number.  The gap between "
                 "matmul_only and full_* isolates the sequential Z-prox/"
                 "prox latency the fused kernels target."),
        "variants": results,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_breakdown_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
