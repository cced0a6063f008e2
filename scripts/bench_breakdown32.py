#!/usr/bin/env python
"""32x32 (n = 1024, m = 4096) on-chip profile of the production solver.

The shape where the reference's PhaseLift/PLOMP/PLGAMP baselines take
HOURS per solve (reference README.md:87) and where r03 reported 9.2
recoveries/s with no breakdown.  This script accounts for where the time
goes at 32x32:

  - kernel-loop iteration rate (scanned fused iteration, no convergence
    tests) at 16x16 vs 32x32 -> the pure per-iteration cost ratio and MFU
  - staged-pipeline stage timings: spectral init, U precompute,
    first-pass solves, refinement
  - selected-iteration counts (does 32x32 need more iterations, or just
    costlier ones?)

Writes BENCH_breakdown32_r04.json.  Run on the TPU chip:
    python scripts/bench_breakdown32.py [batch]
"""

import json
import math
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

PEAK_BF16_TFLOPS = 197.0


def build(nt, m, batch, seed=1):
    from twoace_tpu.ops.cplx import Pair

    n = nt * nt
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 4, (m, n))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    bs, xs = [], []
    for _ in range(batch):
        angs = rng.uniform(-1.2, 1.2, 4)
        h = sum((rng.normal() + 1j * rng.normal())
                * np.outer(steer(nt, angs[2 * i]),
                           steer(nt, angs[2 * i + 1]).conj())
                for i in range(2))
        x = h.T.reshape(-1)
        xs.append(x)
        bs.append(np.abs(a @ x))
    ap = Pair(jnp.asarray(a.real, jnp.float32),
              jnp.asarray(a.imag, jnp.float32))
    return ap, jnp.asarray(np.stack(bs), jnp.float32), np.stack(xs)


def kernel_rate(nt, m, batch, r=20, iters=100):
    """Scanned fused-iteration loop at (nt, m): per-iteration cost floor."""
    from twoace_tpu.ops.cplx import Pair, admm_iteration_pair_t, matmul, \
        panel_gram_basis_pair
    from twoace_tpu.ops.prox import profile_ladder

    n = nt * nt
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 4, (m, n))
    a_np = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)
    u_np = np.linalg.inv(a_np.conj().T @ a_np + np.eye(n))

    def pair(x):
        return Pair(jnp.asarray(x.real, jnp.float32),
                    jnp.asarray(x.imag, jnp.float32))

    a, u = pair(a_np), pair(u_np)
    ladder = profile_ladder(nt, nt, m, n, False)
    b = jnp.asarray(np.abs(a_np @ (rng.normal(size=(n, batch))
                                   + 1j * rng.normal(size=(n, batch)))).T
                    .astype(np.float32))                       # (B, m)
    ones = Pair(jnp.ones((batch, r, n), jnp.float32),
                jnp.zeros((batch, r, n), jnp.float32))
    a_t = Pair(a.re.T, a.im.T)
    y0 = jax.vmap(lambda p: matmul(p, a_t))(ones)

    def seed_basis(z):
        e = Pair(z.re.reshape(r, nt, nt).transpose(2, 0, 1).reshape(nt, r * nt),
                 z.im.reshape(r, nt, nt).transpose(2, 0, 1).reshape(nt, r * nt))
        return panel_gram_basis_pair(e)[1]

    basis0 = jax.vmap(seed_basis)(ones)
    state = (y0, ones,
             Pair(jnp.zeros((batch, r, m), jnp.float32),
                  jnp.zeros((batch, r, m), jnp.float32)),
             Pair(jnp.zeros((batch, r, n), jnp.float32),
                  jnp.zeros((batch, r, n), jnp.float32)),
             jnp.full((batch,), 1e-3, jnp.float32),
             basis0)

    def run(b1, st):
        step = admm_iteration_pair_t(a, b1, u, nt, nt, ladder,
                                     eig_mode="perturb")

        def body(s, _):
            return step(s), None

        st, _ = jax.lax.scan(body, st, None, length=iters)
        return st

    vrun = jax.vmap(run, in_axes=(0, 0))

    @jax.jit
    def go(b1, st):
        out = vrun(b1, st)
        return jnp.sum(out[0].re[:, 0, 0])

    t0 = time.perf_counter()
    float(go(b, state))
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(go(b, state))
    dt = (time.perf_counter() - t0) / reps
    rate = batch * iters / dt

    # analytic FLOPs (Karatsuba complex matmul = 3 real matmuls)
    def mm(x, y, z):
        return 3 * 2 * x * y * z

    fl = mm(r, m, n) + mm(r, n, n) + mm(r, n, m) \
        + 2 * mm(nt, r * nt, nt) + 8 * mm(nt, nt, nt)
    return {"iters_per_s": round(rate, 1),
            "tflops": round(rate * fl / 1e12, 2),
            "mfu_vs_bf16_peak": round(rate * fl / 1e12 / PEAK_BF16_TFLOPS, 4),
            "flops_per_iter": fl,
            "compile_s": round(compile_s, 1)}


def main():
    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops import pair_solver as ps
    from twoace_tpu.ops.cplx import Pair
    from twoace_tpu.ops.pair_solver import solve_lowrank_multi_pair_batch
    from twoace_tpu.ops.prox import profile_ladder_arrays

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nt = 32
    n = nt * nt
    m = 4 * n
    cfg = AdmmConfig(maxiter=500)
    pl = cfg.profile
    ap, b, x_true = build(nt, m, batch)
    key = jax.random.PRNGKey(0)

    # ---- end-to-end staged solve (pure f32, then the warm-phase config)
    t0 = time.perf_counter()
    res = solve_lowrank_multi_pair_batch(key, ap, b, nt, nt, cfg)
    tot = int(np.sum(np.asarray(res.iters)))
    first_s = time.perf_counter() - t0
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solve_lowrank_multi_pair_batch(key, ap, b, nt, nt, cfg)
        tot = int(np.sum(np.asarray(res.iters)))
    e2e_s = (time.perf_counter() - t0) / reps

    cfg_w = AdmmConfig(maxiter=500, warm_iters=80)
    res_w = solve_lowrank_multi_pair_batch(key, ap, b, nt, nt, cfg_w)
    tot_w = int(np.sum(np.asarray(res_w.iters)))
    t0 = time.perf_counter()
    for _ in range(reps):
        res_w = solve_lowrank_multi_pair_batch(key, ap, b, nt, nt, cfg_w)
        tot_w = int(np.sum(np.asarray(res_w.iters)))
    e2e_w_s = (time.perf_counter() - t0) / reps
    x_w = np.asarray(res_w.x.re) + 1j * np.asarray(res_w.x.im)
    x_est = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
    nmse = []
    for u in range(batch):
        c = np.vdot(x_est[u], x_true[u]) / max(
            np.vdot(x_est[u], x_est[u]).real, 1e-30)
        nmse.append(10 * np.log10(max(
            np.linalg.norm(x_true[u] - c * x_est[u]) ** 2
            / np.linalg.norm(x_true[u]) ** 2, 1e-30)))

    # ---- stage: first pass alone (same staging as the batch solver)
    n_restarts = cfg.n_restarts
    keys = jax.random.split(jax.random.fold_in(key, 7), batch)
    k_inits = jax.vmap(lambda ki: jnp.stack(
        [jax.random.split(jax.random.fold_in(ki, i))[1]
         for i in range(n_restarts)]))(keys)
    splits = tuple(
        ps._split(jax.random.split(jax.random.fold_in(key, i))[0], m,
                  cfg.cc_frac)
        for i in range(n_restarts))
    trains = jnp.stack([t for t, _ in splits])
    tests = jnp.stack([t for _, t in splits])
    lm_tr = int(math.floor(m * cfg.cc_frac))
    lad_tr = profile_ladder_arrays(nt, nt, lm_tr, n, False, pl.rank_mults,
                                   pl.fractions, mode=pl.ladder)

    def run_fp():
        with jax.default_matmul_precision(cfg.matmul_precision):
            out = ps._batch_first_pass(
                k_inits, ap, b, trains, tests, lad_tr, nt=nt, nr=nt,
                cfg=cfg, prox_kind="spectral_profile", eig_mode="perturb",
                m_eff=m)
        return out

    out = run_fp()
    it_fp = np.asarray(out[2])
    t0 = time.perf_counter()
    out = run_fp()
    _ = np.asarray(out[2])
    fp_s = time.perf_counter() - t0

    # ---- stage: spectral init alone (per restart x instance)
    a_tr = ps._take_rows(ap, trains[0])

    @jax.jit
    def init_only(ks, bb):
        def one(k, b1):
            return ps.spectral_initialize_pair(a_tr, b1[trains[0]],
                                               min(cfg.rank, n), key=k)
        xs = jax.vmap(one)(ks, bb)
        return jnp.sum(xs.re[:, 0, 0])

    with jax.default_matmul_precision(cfg.matmul_precision):
        float(init_only(k_inits[:, 0], b))
        t0 = time.perf_counter()
        float(init_only(k_inits[:, 0], b))
        init_s = (time.perf_counter() - t0) * n_restarts   # 3 restarts

    # ---- stage: U precompute (per restart, shared across batch)
    @jax.jit
    def u_only():
        u = ps.precompute_u_pair(a_tr)
        return jnp.sum(u.re[0])

    with jax.default_matmul_precision(cfg.matmul_precision):
        float(u_only())
        t0 = time.perf_counter()
        float(u_only())
        u_s = (time.perf_counter() - t0) * (n_restarts + 1)  # + full-data U

    # ---- kernel iteration floors (enough work per call to amortize the
    # tunnel round-trip: the 16x16 shape needs a bigger batch)
    k32 = kernel_rate(nt, m, batch)
    k16 = kernel_rate(16, 1024, 64, iters=200)

    out_json = {
        "workload": {"nt": nt, "m": m, "batch": batch,
                     "maxiter": cfg.maxiter,
                     "matmul_precision": cfg.matmul_precision,
                     "warm_iters": cfg.warm_iters},
        "backend": jax.default_backend(),
        "end_to_end": {
            "wall_s": round(e2e_s, 2),
            "recoveries_per_s": round(batch / e2e_s, 2),
            "selected_iters_per_s": round(tot / e2e_s, 1),
            "selected_iters_per_instance": round(tot / batch, 1),
            "median_nmse_db": round(float(np.median(nmse)), 1),
            "first_call_s": round(first_s, 1),
        },
        "end_to_end_warm80": {
            "wall_s": round(e2e_w_s, 2),
            "recoveries_per_s": round(batch / e2e_w_s, 2),
            "median_nmse_db": round(float(np.median(
                [10 * np.log10(max(
                    np.linalg.norm(x_true[u] - (np.vdot(x_w[u], x_true[u])
                     / max(np.vdot(x_w[u], x_w[u]).real, 1e-30)) * x_w[u]) ** 2
                    / np.linalg.norm(x_true[u]) ** 2, 1e-30))
                 for u in range(batch)])), 1),
        },
        "stages": {
            "first_pass_s": round(fp_s, 2),
            "first_pass_frac": round(fp_s / e2e_s, 3),
            "first_pass_trips": {
                "solve1_mean": round(float(it_fp[..., 0].mean()), 1),
                "solve1_max": int(it_fp[..., 0].max()),
                "solve2_mean": round(float(it_fp[..., 1].mean()), 1),
                "solve2_max": int(it_fp[..., 1].max()),
                "lockstep_waste": round(
                    1.0 - it_fp.sum() / (it_fp.shape[0] * it_fp.shape[1]
                                         * (it_fp[..., 0].max()
                                            + it_fp[..., 1].max())), 3),
            },
            "spectral_init_s_x3": round(init_s, 2),
            "u_precompute_s_x4": round(u_s, 2),
            "residual_s": round(e2e_s - fp_s - init_s - u_s, 2),
            "residual_note": "refine stage + quality evals + host staging",
        },
        "kernel_floor": {"nt32_m4096": k32, "nt16_m1024": k16,
                         "per_iter_cost_ratio_32_over_16": round(
                             k16["iters_per_s"] / k32["iters_per_s"], 2)},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_breakdown32_r04.json")
    with open(path, "w") as f:
        json.dump(out_json, f, indent=2)
    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
