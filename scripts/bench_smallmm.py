#!/usr/bin/env python
"""Micro-benchmark: batched tiny complex matmul chains, three layouts.

The Z-prox runs ~8 dependent complex 16x16 matmuls per iteration over a
256-instance batch.  Compare:
  A) batch-major batched matmul   (B, 16, 16) @ (B, 16, 16)   [current]
  B) batch-on-lanes einsum        (16, 16, B) chains on the VPU
  C) batch-on-lanes with B folded into lanes via reshape to (16, 16*?)

Chain: 8 dependent complex multiplies in pair representation.
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

B, N, CHAIN, REPS = 256, 16, 8, 100


def cplx_mm_batchmajor(ar, ai, br, bi):
    k1 = ar @ (br + bi)
    k2 = (ar + ai) @ bi
    k3 = (ai - ar) @ br
    return k1 - k2, k1 + k3


def cplx_mm_lanes(ar, ai, br, bi):
    # (n, n, B) chains: contract middle index with einsum on the VPU
    k1 = jnp.einsum("ikb,kjb->ijb", ar, br + bi)
    k2 = jnp.einsum("ikb,kjb->ijb", ar + ai, bi)
    k3 = jnp.einsum("ikb,kjb->ijb", ai - ar, br)
    return k1 - k2, k1 + k3


def chain_batchmajor(vr, vi, gr, gi):
    def body(c, _):
        vr, vi = c
        vr, vi = cplx_mm_batchmajor(vr, vi, gr, gi)
        nrm = jnp.sqrt(jnp.sum(vr * vr + vi * vi, axis=(-2, -1),
                               keepdims=True))
        return (vr / nrm, vi / nrm), None

    (vr, vi), _ = jax.lax.scan(body, (vr, vi), None, length=CHAIN * REPS)
    return vr, vi


def chain_lanes(vr, vi, gr, gi):
    def body(c, _):
        vr, vi = c
        vr, vi = cplx_mm_lanes(vr, vi, gr, gi)
        nrm = jnp.sqrt(jnp.sum(vr * vr + vi * vi, axis=(0, 1),
                               keepdims=True))
        return (vr / nrm, vi / nrm), None

    (vr, vi), _ = jax.lax.scan(body, (vr, vi), None, length=CHAIN * REPS)
    return vr, vi


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        float(jnp.sum(out[0]))
    return (time.perf_counter() - t0) / 3


def main():
    rng = np.random.default_rng(0)
    g = rng.normal(size=(B, N, N)).astype(np.float32)
    gi = rng.normal(size=(B, N, N)).astype(np.float32)
    v = rng.normal(size=(B, N, N)).astype(np.float32)
    vi = rng.normal(size=(B, N, N)).astype(np.float32)

    dt = timeit(jax.jit(chain_batchmajor), jnp.asarray(v), jnp.asarray(vi),
                jnp.asarray(g), jnp.asarray(gi))
    per = dt / (CHAIN * REPS) * 1e6
    print(f"batch-major: {per:8.1f} us per batched complex {N}x{N} matmul")

    tl = lambda x: jnp.asarray(np.transpose(x, (1, 2, 0)))
    dt = timeit(jax.jit(chain_lanes), tl(v), tl(vi), tl(g), tl(gi))
    per = dt / (CHAIN * REPS) * 1e6
    print(f"batch-lanes: {per:8.1f} us per batched complex {N}x{N} matmul")


if __name__ == "__main__":
    main()
