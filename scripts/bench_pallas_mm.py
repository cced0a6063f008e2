#!/usr/bin/env python
"""Prototype: lanes-packed batched complex 16x16 matmul in Pallas.

Layout (n, n, B): instance axis on lanes, contraction as an unrolled
16-step FMA on the VPU.  Compare against XLA's batch-major batched matmul
(~33.5 us per batched complex matmul at B=256, see bench_smallmm.py).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, N, TB = 256, 16, 128
CHAIN, REPS = 8, 100


def _mm3(a, b, n_k):
    """C[i,j,:] = sum_k a[i,k,:] b[k,j,:] — unrolled FMA on the VPU."""
    acc = a[:, 0:1, :] * b[0:1, :, :]
    for k in range(1, n_k):
        acc = acc + a[:, k:k + 1, :] * b[k:k + 1, :, :]
    return acc


def _mm3_kfirst(a_t, b, n_k):
    """C[i,j,:] = sum_k a_t[k,i,:] b[k,j,:] — contraction along the LEADING
    (untiled) axis: every k-slice is a contiguous (n, TB) tile and the
    broadcasts are leading-dim (free) / sublane (cheap)."""
    acc = a_t[0][:, None, :] * b[0][None, :, :]
    for k in range(1, n_k):
        acc = acc + a_t[k][:, None, :] * b[k][None, :, :]
    return acc


MODE = os.environ.get("MODE", "mid")


def chain_kernel(vr_ref, vi_ref, gr_ref, gi_ref, or_ref, oi_ref):
    vr, vi = vr_ref[:], vi_ref[:]
    gr, gi = gr_ref[:], gi_ref[:]
    for _ in range(CHAIN):
        if MODE == "kfirst":
            # lhs must be k-leading: V[i,k,:] -> V^T[k,i,:]
            vrt = jnp.swapaxes(vr, 0, 1)
            vit = jnp.swapaxes(vi, 0, 1)
            k1 = _mm3_kfirst(vrt, gr + gi, N)
            k2 = _mm3_kfirst(vrt + vit, gi, N)
            k3 = _mm3_kfirst(vit - vrt, gr, N)
        else:
            k1 = _mm3(vr, gr + gi, N)
            k2 = _mm3(vr + vi, gi, N)
            k3 = _mm3(vi - vr, gr, N)
        vr, vi = k1 - k2, k1 + k3
        nrm = jax.lax.rsqrt(jnp.sum(vr * vr + vi * vi, axis=(0, 1),
                                    keepdims=True) + 1e-30)
        vr, vi = vr * nrm, vi * nrm
    or_ref[:] = vr
    oi_ref[:] = vi


@jax.jit
def run_pallas(vr, vi, gr, gi):
    spec = pl.BlockSpec((N, N, TB), lambda t: (0, 0, t),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        chain_kernel,
        grid=(B // TB,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N, N, B), jnp.float32)] * 2,
    )

    def body(c, _):
        vr, vi = f(c[0], c[1], gr, gi)
        return (vr, vi), None

    (vr, vi), _ = jax.lax.scan(body, (vr, vi), None, length=REPS)
    return vr, vi


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(N, N, B)) / 4, jnp.float32)
    vr, vi, gr, gi = mk(), mk(), mk(), mk()

    out = run_pallas(vr, vi, gr, gi)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run_pallas(vr, vi, gr, gi)
        float(jnp.sum(out[0]))
    dt = (time.perf_counter() - t0) / 3
    per = dt / (CHAIN * REPS) * 1e6
    print(f"pallas lanes-packed: {per:8.2f} us per batched complex "
          f"{N}x{N} matmul (B={B})")

    # correctness vs numpy
    vr_n, vi_n = np.asarray(vr), np.asarray(vi)
    gr_n, gi_n = np.asarray(gr), np.asarray(gi)
    v = np.transpose(vr_n + 1j * vi_n, (2, 0, 1))
    g = np.transpose(gr_n + 1j * gi_n, (2, 0, 1))
    for _ in range(CHAIN * REPS):
        v = np.einsum("bik,bkj->bij", v, g)
        v = v / np.linalg.norm(v, axis=(1, 2), keepdims=True)
    got = np.transpose(np.asarray(out[0]) + 1j * np.asarray(out[1]),
                       (2, 0, 1))
    err = np.abs(got - v).max()
    print(f"max abs err vs numpy: {err:.2e}")


if __name__ == "__main__":
    main()
