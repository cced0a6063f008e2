#!/usr/bin/env python
"""Cold-compile breakdown of the staged batch solver (VERDICT r2 item 8).

Measures, per staged jit of ``solve_lowrank_multi_pair_batch`` (plus the
single-latency path), with the persistent compilation cache DISABLED:

  lower_s     host-side trace + StableHLO lowering time
  compile_s   backend (XLA) compile time — through the tunnel on axon,
              so this includes the remote round-trip
  hlo_lines   lowered StableHLO text size (graph-size proxy)

Writes ``COMPILE_r04.json`` at the repo root.  Run on the TPU host; a
truly cold run takes tens of minutes (that is the point — this artifact
is the evidence for where that time goes).

Usage:  python scripts/compile_profile.py [--backend cpu]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TWOACE_NO_COMPILE_CACHE", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="force a JAX platform (e.g. cpu) for comparison")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.backend:
        os.environ["JAX_PLATFORMS"] = args.backend

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_compilation_cache", False)

    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.cplx import Pair
    from twoace_tpu.ops import pair_solver as ps
    from twoace_tpu.ops.prox import profile_ladder_arrays

    nt = nr = 16
    n = nt * nr
    m = 4 * n
    batch = args.batch
    cfg = AdmmConfig(maxiter=500)
    pl = cfg.profile
    prox_kind, eig_mode = "spectral_profile", "perturb"

    rng = np.random.default_rng(0)
    bits = rng.integers(0, 4, (m, n))
    a_np = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)
    a = Pair(jnp.asarray(a_np.real, jnp.float32),
             jnp.asarray(a_np.imag, jnp.float32))
    b_batch = jnp.asarray(
        np.abs(a_np @ (rng.normal(size=(n, batch))
                       + 1j * rng.normal(size=(n, batch)))).T, jnp.float32)

    # --- replicate the staging prologue (solve_lowrank_multi_pair_batch) ---
    key = jax.random.PRNGKey(0)
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
    m_tr = trains.shape[1]
    r = min(cfg.rank, m_tr, n)

    lad_tr = profile_ladder_arrays(nt, nr, m_tr, n, False, pl.rank_mults,
                                   pl.fractions, mode=pl.ladder)
    lad_tr_r1 = profile_ladder_arrays(nt, nr, m_tr, n, True, pl.rank_mults,
                                      pl.fractions, mode=pl.ladder)
    lad_full = profile_ladder_arrays(nt, nr, m, n, False, pl.rank_mults,
                                     pl.fractions, mode=pl.ladder)
    lad_full_r1 = profile_ladder_arrays(nt, nr, m, n, True, pl.rank_mults,
                                        pl.fractions, mode=pl.ladder)

    stat = dict(nt=nt, nr=nr, cfg=cfg, prox_kind=prox_kind,
                eig_mode=eig_mode)

    # retry stage args: a 16-pair bucket (the typical padded gather size)
    k_pad = 16
    b_sel = b_batch[:k_pad]
    train_sel = jnp.broadcast_to(trains[0], (k_pad, m_tr))
    test_sel = jnp.broadcast_to(tests[0], (k_pad, m - m_tr))
    xs_sel = Pair(jnp.zeros((k_pad, r, n), jnp.float32),
                  jnp.zeros((k_pad, r, n), jnp.float32))

    # refine stage args (shapes only; values irrelevant for compile)
    x = Pair(jnp.zeros((batch, n_restarts, n), jnp.float32),
             jnp.zeros((batch, n_restarts, n), jnp.float32))
    q = jnp.zeros((batch, n_restarts), jnp.float32)
    it_sum = jnp.zeros((batch,), jnp.int32)
    r1_flags = jnp.zeros((batch, n_restarts), bool)
    a_norm = jnp.asarray(1.0, jnp.float32)
    b_norm = jnp.ones((batch,), jnp.float32)

    stages = {
        "first_pass": (ps._batch_first_pass,
                       (k_inits, a, b_batch, trains, tests, lad_tr),
                       dict(stat, m_eff=m)),
        "retry_k16": (ps._batch_retry,
                      (a, b_sel, train_sel, test_sel, xs_sel,
                       jnp.zeros((k_pad,), jnp.int32), trains, lad_tr_r1),
                      stat),
        "refine": (ps._batch_refine,
                   (a, b_batch, x, q, it_sum, r1_flags, lad_full,
                    lad_full_r1, a_norm, b_norm), stat),
        "single_latency": (ps.solve_lowrank_multi_pair,
                           (key, a, b_batch[0]),
                           dict(nt=nt, nr=nr, cfg=cfg, prox_kind=prox_kind,
                                eig_mode=eig_mode, n_restarts=None)),
    }

    results = {}
    for name, (fn, fargs, fkw) in stages.items():
        t0 = time.perf_counter()
        # lower under the production matmul-precision context, exactly as
        # solve_lowrank_multi_pair{_batch} traces these stages — otherwise
        # the profile measures (and cache-warms) graph variants production
        # never compiles
        with jax.default_matmul_precision(cfg.matmul_precision):
            lowered = fn.lower(*fargs, **fkw)
        lower_s = time.perf_counter() - t0
        txt = lowered.as_text()
        t0 = time.perf_counter()
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        entry = {
            "lower_s": round(lower_s, 2),
            "compile_s": round(compile_s, 2),
            "hlo_lines": txt.count("\n"),
            "hlo_bytes": len(txt),
        }
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            entry["flops"] = ca.get("flops")
        except Exception:
            pass
        results[name] = entry
        print(json.dumps({"stage": name, **entry}), flush=True)

    total_compile = sum(v["compile_s"] for v in results.values())
    out = {
        "backend": jax.default_backend(),
        "batch": batch,
        "maxiter": cfg.maxiter,
        "persistent_cache": "disabled for this measurement",
        "stages": results,
        "total_compile_s": round(total_compile, 1),
        "note": ("lower_s is host-side tracing (pure Python/StableHLO); "
                 "compile_s is XLA backend compile — on the axon tunnel it "
                 "includes the remote round-trip.  first_pass and retry "
                 "each inline TWO while-loop body copies "
                 "(scale_by_row=True overparameterized pass + =False "
                 "per-column refinement, ops/pair_solver.py::_impl_pair); "
                 "refine inlines one.  retry compiles lazily only when "
                 "the host-side quality gate finds poor restarts.  "
                 "Mitigation shipped: the persistent compile cache is now "
                 "default-on at package import (twoace_tpu/__init__.py), "
                 "so every shape is paid once per machine, ever."),
    }
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COMPILE_r04.json" if jax.default_backend() != "cpu"
        else "COMPILE_r04_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
