#!/usr/bin/env python
"""Generate golden traces from the mechanical MATLAB transcript.

Runs ``tests/matlab_transcript.py`` (the line-by-line, column-major-faithful
transliteration of inferLowRankV4_multi.m — see its module docstring for why
it exists) on seeded float64 problems and stores inputs + outputs as
``tests/golden/golden_v1.npz``.  ``tests/test_golden_matlab.py`` then asserts
that the committed goldens are reproduced by (a) the transcript itself
(regeneration determinism), (b) the ``tests/reference_numpy.py`` oracle, and
(c) the JAX solvers — breaking the oracle<->JAX circularity flagged in
VERDICT r1.

The problem set deliberately covers every branch of the ArgMinZ constraint
ladder (ref: inferLowRankV4_multi.m:437-464):
  sz8_under   sz=8  -> r1=2  -> single (r2, f2) small-size fallback (:454-457)
  sz16_under  sz=16 -> r0=2  -> 3-level ladder (:458-460)
  sz16_over   m >= 3n        -> single (r3, f3) overdetermined (:451-453)
  sz25_under  sz=25 -> r0=3  -> full 4-level ladder (:461-463)
  rank_one    use_rank_one   -> (1, 0.95) (:448-450)
plus the ArgMinY zero-row branch (:516-519) and full InferADMM /
inferLowRankV4_multi solves.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import matlab_transcript as mt  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "golden_v1.npz")


def crandn(rng, *shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)) \
        / np.sqrt(2)


def steer(nn, ang):
    return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)


def sparse_channel(rng, nt, nr, paths=2):
    h = sum((rng.normal() + 1j * rng.normal())
            * np.outer(steer(nr, a1), steer(nt, a2).conj())
            for a1, a2 in rng.uniform(-1.2, 1.2, (paths, 2)))
    return h.T.reshape(-1)          # vec, Rx fastest


def codebook(rng, m, n):
    bits = rng.integers(0, 4, (m, n))
    return np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)


def main():
    rng = np.random.default_rng(20260819)
    g = {}

    # ---- ArgMinZ over every ladder branch -------------------------------
    cases = [
        ("sz8_under", 8, 8, 64, False),     # r1 <= 2 fallback
        ("sz16_under", 16, 16, 300, False),  # r0 <= 2 -> 3 levels
        ("sz16_over", 16, 16, 1024, False),  # m >= 3n -> (r3, f3)
        ("sz25_under", 25, 25, 700, False),  # full 4-level ladder
        ("rank_one", 8, 8, 64, True),        # (1, 0.95)
    ]
    for name, nt, nr, m, r1 in cases:
        n = nt * nr
        r = 6
        x = crandn(rng, n, r)
        n_dual = 0.1 * crandn(rng, n, r)
        mu = 0.37
        z = mt.argmin_z_m(x.copy(), n_dual, mu, nt, nr, m, n, r1)
        g[f"z_{name}_x"] = x
        g[f"z_{name}_nd"] = n_dual
        g[f"z_{name}_mu"] = mu
        g[f"z_{name}_shape"] = np.array([nt, nr, m, n, int(r1)])
        g[f"z_{name}_out"] = z

    # ---- ArgMinY incl. the zero-row branch ------------------------------
    m, r = 32, 5
    ax = crandn(rng, m, r)
    md = 0.2 * crandn(rng, m, r)
    mu = 0.51
    # force entries where AX + M/mu == 0 exactly (the ref zero branch
    # :516-519 / :526-528).  Exact zeros, not cancellation: XLA compiles
    # x/mu as x*(1/mu), so (-md/mu) + md*(1/mu) is not exactly 0 there.
    ax[3] = 0.0
    md[3] = 0.0                      # whole row zero: row-norm branch
    ax[17, 1::2] = 0.0
    md[17, 1::2] = 0.0               # mixed row: elementwise branch only
    b = np.abs(crandn(rng, m)) + 0.1
    for by_row in (True, False):
        tag = "row" if by_row else "elem"
        g[f"y_{tag}_out"] = mt.argmin_y_m(ax.copy(), b, md, mu, by_row)
        g[f"yn_{tag}_out"] = mt.normalize_rows_m(ax.copy(), b, by_row)
    g["y_ax"], g["y_md"], g["y_b"], g["y_mu"] = ax, md, b, mu

    # ---- SpectralInitialize ---------------------------------------------
    nt = nr = 8
    n = nt * nr
    m = 256
    a = codebook(rng, m, n)
    x_true = sparse_channel(rng, nt, nr)
    b = np.abs(a @ x_true)
    xs = mt.spectral_initialize_m(a, b, 10)
    g["si_a"], g["si_b"], g["si_r"] = a, b, 10
    g["si_proj"] = xs @ xs.conj().T        # phase/order-invariant projector
    g["si_colnorm"] = np.linalg.norm(xs, axis=0)

    # ---- one full InferADMM (small, deterministic) ----------------------
    nt = nr = 4
    n, m = 16, 64
    a4 = codebook(rng, m, n)
    x4 = sparse_channel(rng, nt, nr, paths=1)
    b4 = np.abs(a4 @ x4)
    xs4 = mt.spectral_initialize_m(a4, b4, 6)
    xo, yo, conv = mt.infer_admm_m(a4, b4, xs4, True, False, nt, nr,
                                   maxiter=60)
    g["ia_a"], g["ia_b"], g["ia_xs"] = a4, b4, xs4
    g["ia_x"], g["ia_y"], g["ia_conv"] = xo, yo, conv

    # ---- full inferLowRankV4_multi scaffold ------------------------------
    nt = nr = 8
    n, m = 64, 256
    a8 = codebook(rng, m, n)
    x8 = sparse_channel(rng, nt, nr, paths=2)
    b8 = np.abs(a8 @ x8)
    k = int(np.floor(m * 0.95))
    splits = [rng.permutation(m)[:k] for _ in range(3)]
    xr, q = mt.infer_lowrank_v4_multi_m(a8, b8, nt, nr, splits, maxiter=200)
    c = np.vdot(xr, x8) / max(np.vdot(xr, xr).real, 1e-30)
    nmse_db = 10 * np.log10(np.linalg.norm(x8 - c * xr) ** 2
                            / np.linalg.norm(x8) ** 2)
    g["full_a"], g["full_b"], g["full_xtrue"] = a8, b8, x8
    g["full_splits"] = np.stack(splits)
    g["full_x"], g["full_quality"] = xr, q
    g["full_nmse_db"] = nmse_db

    # ---- RECTANGULAR (Nt != Nr) ArgMinZ: pin the documented deviation ----
    # MATLAB's ``E = reshape(Z, tx, [])`` (ref :426) chops the Rx-fastest
    # vec into tx-sized chunks; for Nt != Nr those chunks misalign with the
    # physical Rx runs and the prox acts on a SCRAMBLED panel.  The repo
    # keeps the physically-meaningful Rx-row panel instead (equivalently:
    # MATLAB's own code with the reshape leading dim set to rx), which
    # coincides with the reference exactly when Nt == Nr (every production
    # shape).  Both behaviors are recorded here:
    #   z_<case>_out          MATLAB-exact (transcript, tx-chunk reshape)
    #   z_<case>_out_rxpanel  the repo semantics (rx-chunk reshape)
    # tests/test_golden_matlab.py asserts the repo matches _rxpanel, the
    # transcript matches _out, and that the two genuinely differ.
    rng2 = np.random.default_rng(20260820)
    for name, nt, nr in (("rect8x4", 8, 4), ("rect4x8", 4, 8)):
        n = nt * nr
        m = 3 * n - 1          # keep the multi-level ladder branch
        r = 6
        x = crandn(rng2, n, r)
        n_dual = 0.1 * crandn(rng2, n, r)
        mu = 0.37
        g[f"z_{name}_x"] = x
        g[f"z_{name}_nd"] = n_dual
        g[f"z_{name}_mu"] = mu
        g[f"z_{name}_shape"] = np.array([nt, nr, m, n, 0])
        g[f"z_{name}_out"] = mt.argmin_z_m(x.copy(), n_dual, mu, nt, nr,
                                           m, n, False)
        g[f"z_{name}_out_rxpanel"] = mt.argmin_z_m(x.copy(), n_dual, mu,
                                                   nr, nt, m, n, False)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **g)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1024:.0f} KiB), "
          f"full-solve NMSE {nmse_db:.1f} dB, quality {q:.4f}")


if __name__ == "__main__":
    main()
