"""Pallas kernel correctness vs the cplx reference path (interpret mode on
CPU; the same kernels compile on TPU)."""

import numpy as np
import jax.numpy as jnp

from twoace_tpu.ops import cplx
from twoace_tpu.ops.pallas import (fused_prox_dual, fused_prox_dual_t,
                                   pair_matmul)


def _pair(rng, *shape):
    return cplx.Pair(jnp.asarray(rng.normal(size=shape), jnp.float32),
                     jnp.asarray(rng.normal(size=shape), jnp.float32))


def test_fused_prox_dual_matches_reference():
    rng = np.random.default_rng(0)
    m, r = 192, 24
    ax = _pair(rng, m, r)
    md = _pair(rng, m, r)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    mu = 0.31
    y, m_new = fused_prox_dual(ax, b, md, mu, block_rows=64, interpret=True)
    y_ref = cplx.magnitude_prox_rows(ax, b, md, mu)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.im), np.asarray(y_ref.im),
                               atol=1e-5)
    m_ref_re = md.re + mu * (ax.re - y_ref.re)
    m_ref_im = md.im + mu * (ax.im - y_ref.im)
    np.testing.assert_allclose(np.asarray(m_new.re), np.asarray(m_ref_re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_new.im), np.asarray(m_ref_im),
                               atol=1e-5)


def test_fused_prox_dual_ragged_rows():
    rng = np.random.default_rng(1)
    m, r = 100, 8           # not a multiple of the block size
    ax = _pair(rng, m, r)
    md = _pair(rng, m, r)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    y, _ = fused_prox_dual(ax, b, md, 0.5, block_rows=64, interpret=True)
    y_ref = cplx.magnitude_prox_rows(ax, b, md, 0.5)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)


def test_fused_prox_dual_t_matches_reference():
    rng = np.random.default_rng(3)
    r, m = 24, 192
    ax = _pair(rng, r, m)
    md = _pair(rng, r, m)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    mu = 0.31
    y, m_new = fused_prox_dual_t(ax, b, md, mu, block_cols=64,
                                 interpret=True)
    y_ref = cplx.magnitude_prox_cols(ax, b, md, mu)
    np.testing.assert_allclose(np.asarray(y.re), np.asarray(y_ref.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.im), np.asarray(y_ref.im),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_new.re), np.asarray(md.re + mu * (ax.re - y_ref.re)),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_new.im), np.asarray(md.im + mu * (ax.im - y_ref.im)),
        atol=1e-5)


def test_admm_iteration_pallas_prox_matches_xla_path():
    # the production transposed iteration with the fused Pallas prox+dual
    # (interpret mode) must track the plain XLA path exactly
    from twoace_tpu.ops.prox import profile_ladder

    rng = np.random.default_rng(4)
    nt = nr = 4
    n, m, r = nt * nr, 48, 6
    a = _pair(rng, m, n)
    u = np.linalg.inv((a.re + 1j * a.im).conj().T @ (a.re + 1j * a.im)
                      + np.eye(n))
    u_p = cplx.Pair(jnp.asarray(u.real, jnp.float32),
                    jnp.asarray(u.imag, jnp.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    ladder = profile_ladder(nt, nr, m, n, False)
    state = (_pair(rng, r, m), _pair(rng, r, n), _pair(rng, r, m),
             _pair(rng, r, n), jnp.asarray(0.2, jnp.float32),
             jnp.eye(2 * nr, dtype=jnp.float32))
    step_ref = cplx.admm_iteration_pair_t(a, b, u_p, nt, nr, ladder)
    step_pl = cplx.admm_iteration_pair_t(a, b, u_p, nt, nr, ladder,
                                         pallas_prox=True,
                                         pallas_interpret=True)
    out_ref = step_ref(state)
    out_pl = step_pl(state)
    for pr, pp in zip(out_ref[:4], out_pl[:4]):
        np.testing.assert_allclose(np.asarray(pp.re), np.asarray(pr.re),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pp.im), np.asarray(pr.im),
                                   atol=1e-5)


def test_pair_matmul_matches_reference():
    rng = np.random.default_rng(2)
    a = _pair(rng, 256, 192)
    b = _pair(rng, 192, 160)
    out = pair_matmul(a, b, tm=128, tn=128, tk=64, interpret=True)
    ref = cplx.matmul(a, b)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(ref.re),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(ref.im),
                               atol=1e-3)


def test_fused_zprox_matches_reference():
    """Fused Z-prox kernel == _panel_spectral_prox_c on a warm basis
    (ref: inferLowRankV4_multi.m:423-485), incl. a second warm iteration
    and vmap batching."""
    import jax

    from twoace_tpu.ops.pallas import fused_zprox_t
    from twoace_tpu.ops.prox import profile_ladder

    nt = nr = 8
    r = 12
    n = nt * nr
    ladder = tuple(profile_ladder(nt, nr, 4 * n, n, False))
    rng = np.random.default_rng(7)
    z = _pair(rng, r, n)

    def to_panel(x):
        return x.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt)

    def from_panel(e):
        return e.reshape(nr, r, nt).transpose(1, 2, 0).reshape(r, nt * nr)

    e = cplx.Pair(to_panel(z.re), to_panel(z.im))
    v0 = cplx.panel_gram_basis_pair(e)[1]
    e_ref, v_ref = cplx._panel_spectral_prox_c(e, nr, ladder, v0)
    z_ref = cplx.Pair(from_panel(e_ref.re), from_panel(e_ref.im))

    z_pl, v_pl = fused_zprox_t(z, v0, nt, nr, ladder, interpret=True)
    np.testing.assert_allclose(np.asarray(z_pl.re), np.asarray(z_ref.re),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_pl.im), np.asarray(z_ref.im),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_pl.re), np.asarray(v_ref.re),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_pl.im), np.asarray(v_ref.im),
                               atol=2e-5)

    # warm second iteration through each path stays in agreement
    e2_ref, _ = cplx._panel_spectral_prox_c(e, nr, ladder, v_ref)
    z2_ref = cplx.Pair(from_panel(e2_ref.re), from_panel(e2_ref.im))
    z2_pl, _ = fused_zprox_t(z, v_pl, nt, nr, ladder, interpret=True)
    np.testing.assert_allclose(np.asarray(z2_pl.re), np.asarray(z2_ref.re),
                               atol=5e-5)

    # vmap adds a grid axis
    zb = cplx.Pair(jnp.stack([z.re] * 3), jnp.stack([z.im] * 3))
    vb = cplx.Pair(jnp.stack([v0.re] * 3), jnp.stack([v0.im] * 3))
    zb_pl, _ = jax.vmap(
        lambda zz, vv: fused_zprox_t(zz, vv, nt, nr, ladder,
                                     interpret=True))(zb, vb)
    np.testing.assert_allclose(np.asarray(zb_pl.re[2]), np.asarray(z_ref.re),
                               atol=2e-5)


def test_admm_iteration_pallas_zprox_matches_xla_path():
    """Full fused iteration with the Pallas Z-prox == the JAX Z-prox path."""
    import jax

    from twoace_tpu.ops.prox import profile_ladder

    nt = nr = 8
    n = nt * nr
    m = 2 * n
    r = 12
    ladder = tuple(profile_ladder(nt, nr, m, n, False))
    rng = np.random.default_rng(9)
    a = _pair(rng, m, n)
    b = jnp.asarray(rng.uniform(0.5, 2.0, m), jnp.float32)
    ug = np.linalg.inv(
        (np.asarray(a.re) + 1j * np.asarray(a.im)).conj().T
        @ (np.asarray(a.re) + 1j * np.asarray(a.im)) + np.eye(n))
    u_mat = cplx.Pair(jnp.asarray(ug.real, jnp.float32),
                      jnp.asarray(ug.imag, jnp.float32))

    x0 = _pair(rng, r, n)
    a_t = cplx.Pair(a.re.T, a.im.T)
    y0 = cplx.matmul(x0, a_t)
    zeros_m = cplx.Pair(jnp.zeros((r, m), jnp.float32),
                        jnp.zeros((r, m), jnp.float32))
    zeros_n = cplx.Pair(jnp.zeros((r, n), jnp.float32),
                        jnp.zeros((r, n), jnp.float32))

    def seed(z):
        e = cplx.Pair(
            z.re.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt),
            z.im.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt))
        return cplx.panel_gram_basis_pair(e)[1]

    state = (y0, x0, zeros_m, zeros_n,
             jnp.asarray(0.5, jnp.float32), seed(x0))

    step_ref = cplx.admm_iteration_pair_t(a, b, u_mat, nt, nr, ladder,
                                          eig_mode="perturb",
                                          pallas_zprox=False)
    step_pl = cplx.admm_iteration_pair_t(a, b, u_mat, nt, nr, ladder,
                                         eig_mode="perturb",
                                         pallas_zprox=True,
                                         pallas_interpret=True)
    s_ref, s_pl = state, state
    for _ in range(3):
        s_ref = step_ref(s_ref)
        s_pl = step_pl(s_pl)
    for i, (pr, pp) in enumerate(zip(s_ref[:4], s_pl[:4])):
        np.testing.assert_allclose(np.asarray(pp.re), np.asarray(pr.re),
                                   atol=5e-4, err_msg=f"state {i} re")
        np.testing.assert_allclose(np.asarray(pp.im), np.asarray(pr.im),
                                   atol=5e-4, err_msg=f"state {i} im")


def test_fused_infer_admm_full_solve_parity(monkeypatch):
    """The MEGAKERNEL full-solve path (ops/pallas/solver_kernel.py,
    fused_infer_admm — the batch-1 DEFAULT on TPU) matches the XLA path at
    the level of the complete inferLowRankV4_multi scaffold: same selected
    iteration counts and recovered channel (interpret mode on CPU).

    Guards the production single-solve default against regression — the
    rest of the suite only covers the sub-kernels and single iterations.
    """
    import jax

    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.pair_solver import _solve_lowrank_core

    monkeypatch.setenv("TWOACE_MEGAKERNEL", "1")
    rng = np.random.default_rng(7)
    nt = nr = 8
    n = nt * nr
    m = 2 * n
    bits = rng.integers(0, 4, (m, n))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    angs = rng.uniform(-1.0, 1.0, 4)
    h = sum((rng.normal() + 1j * rng.normal())
            * np.outer(steer(nr, angs[2 * i]), steer(nt, angs[2 * i + 1]).conj())
            for i in range(2))
    x_true = h.T.reshape(-1)
    b = jnp.asarray(np.abs(a @ x_true), jnp.float32)
    ap = cplx.Pair(jnp.asarray(a.real, jnp.float32),
                   jnp.asarray(a.imag, jnp.float32))
    cfg = AdmmConfig(maxiter=60, n_restarts=1)
    key = jax.random.PRNGKey(3)

    res_xla = _solve_lowrank_core(key, ap, b, nt, nr, cfg,
                                  "spectral_profile", "perturb", 1, None,
                                  use_pallas=False)
    res_pl = _solve_lowrank_core(key, ap, b, nt, nr, cfg,
                                 "spectral_profile", "perturb", 1, None,
                                 use_pallas=True)    # interpret on CPU

    def nmse_db(res):
        x = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
        c = np.vdot(x, x_true) / max(np.vdot(x, x).real, 1e-30)
        return 10 * np.log10(np.linalg.norm(x_true - c * x) ** 2
                             / np.linalg.norm(x_true) ** 2)

    assert int(res_pl.iters) == int(res_xla.iters)
    # quality carries ~500 iterations of fp32 drift between the interpret
    # kernel and XLA's fusion order; 0.02 absolute is the observed envelope
    np.testing.assert_allclose(float(res_pl.quality),
                               float(res_xla.quality), atol=2e-2)
    n_xla, n_pl = nmse_db(res_xla), nmse_db(res_pl)
    assert abs(n_xla - n_pl) < 1.0, (n_xla, n_pl)
    assert n_pl < -15.0, n_pl


def test_fused_infer_admm_split3_converges():
    """kernel_precision="split3" (VERDICT r04 #6): the 3-pass compensated
    megakernel must still solve the full scaffold to deep NMSE.  The hi/lo
    bf16 decomposition is REAL in interpret mode too (it changes the
    numerics, unlike the precision attr which CPU ignores), so this pins
    that the ~2^-16 per-product error stays convergence-class."""
    import jax

    from twoace_tpu.config import AdmmConfig
    from twoace_tpu.ops.pair_solver import _solve_lowrank_core

    rng = np.random.default_rng(11)
    nt = nr = 8
    n = nt * nr
    m = 2 * n
    bits = rng.integers(0, 4, (m, n))
    a = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)

    def steer(nn, ang):
        return np.exp(1j * np.pi * np.arange(nn) * np.sin(ang)) / np.sqrt(nn)

    angs = rng.uniform(-1.0, 1.0, 4)
    h = sum((rng.normal() + 1j * rng.normal())
            * np.outer(steer(nr, angs[2 * i]), steer(nt, angs[2 * i + 1]).conj())
            for i in range(2))
    x_true = h.T.reshape(-1)
    b = jnp.asarray(np.abs(a @ x_true), jnp.float32)
    ap = cplx.Pair(jnp.asarray(a.real, jnp.float32),
                   jnp.asarray(a.imag, jnp.float32))
    cfg = AdmmConfig(maxiter=60, n_restarts=1, kernel_precision="split3")
    key = jax.random.PRNGKey(3)
    # use_pallas=False + kernel_precision="split3" must STILL engage the
    # megakernel (the production-float32 engagement path)
    res = _solve_lowrank_core(key, ap, b, nt, nr, cfg,
                              "spectral_profile", "perturb", 1, None,
                              use_pallas=False)
    x = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
    c = np.vdot(x, x_true) / max(np.vdot(x, x).real, 1e-30)
    nmse = 10 * np.log10(np.linalg.norm(x_true - c * x) ** 2
                         / np.linalg.norm(x_true) ** 2)
    assert nmse < -15.0, nmse
    assert float(res.quality) > 0.8


def test_kernelprec_r05_negative_result_pinned():
    """BENCH_kernelprec_r05.json: the committed measured dead end — the
    split3 megakernel converges (deep NMSE, normal iteration count) but
    LOSES to the XLA float32 path on device time, which is why
    ops/pallas stays bench-only for the production float32 path."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_kernelprec_r05.json")
    with open(path) as f:
        d = json.load(f)
    pts = {p["variant"]: p for p in d["points"]}
    xla, sp3 = pts["xla_f32_cold"], pts["kernel_split3"]
    assert "error" not in sp3, sp3
    assert sp3["nmse_db"] <= -90.0          # convergence-class in-kernel
    assert abs(sp3["iters"] - xla["iters"]) < 200
    assert sp3["device_ms"] > xla["device_ms"]   # the measured loss


def test_fused_zprox_batch_matches_vmapped_chain():
    """The lane-packed block-diagonal batched Z-prox kernel ==
    vmap(_panel_spectral_prox_c) over instances (interpret mode).

    This is the batch-256 production form: G = 128//nr instances per
    (128, 128) MXU tile, block-diagonal algebra confining every reduction
    to its instance (see kernels.fused_zprox_batch)."""
    import jax

    from twoace_tpu.ops.cplx import _panel_spectral_prox_c
    from twoace_tpu.ops.pallas.kernels import (fused_zprox_batch,
                                               pack_basis_w)
    from twoace_tpu.ops.prox import profile_ladder

    rng = np.random.default_rng(11)
    nt = nr = 16
    n = nt * nr
    batch, r = 16, 6
    ladder = profile_ladder(nt, nr, 4 * n, n, False)

    z = cplx.Pair(jnp.asarray(rng.normal(size=(batch, r, n)), jnp.float32),
                  jnp.asarray(rng.normal(size=(batch, r, n)), jnp.float32))

    def to_panel(zi):
        return cplx.Pair(
            zi.re.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt),
            zi.im.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt))

    def from_panel(e):
        return cplx.Pair(
            e.re.reshape(nr, r, nt).transpose(1, 2, 0).reshape(r, nt * nr),
            e.im.reshape(nr, r, nt).transpose(1, 2, 0).reshape(r, nt * nr))

    # cold bases per instance (E-convention)
    def seed(zi):
        return cplx.panel_gram_basis_pair(to_panel(zi))[1]

    basis0 = jax.vmap(seed)(z)

    def ref_one(zi, v0):
        e_new, v = _panel_spectral_prox_c(to_panel(zi), nr, ladder, v0)
        return from_panel(e_new), v

    z_ref, v_ref = jax.vmap(ref_one)(z, basis0)

    packed0 = pack_basis_w(basis0, nr)
    z_pl, v_pl = fused_zprox_batch(z, packed0, nt, nr, tuple(ladder),
                                   interpret=True)

    np.testing.assert_allclose(np.asarray(z_pl.re), np.asarray(z_ref.re),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(z_pl.im), np.asarray(z_ref.im),
                               atol=2e-4)

    # packed bases: diagonal blocks == per-instance bases (W = conj(E))
    g = 128 // nr
    vr = np.asarray(v_pl.re).reshape(batch // g, g, nr, g, nr)
    vi = np.asarray(v_pl.im).reshape(batch // g, g, nr, g, nr)
    for bi in range(batch):
        grp, gg = bi // g, bi % g
        np.testing.assert_allclose(vr[grp, gg, :, gg, :],
                                   np.asarray(v_ref.re[bi]), atol=2e-4)
        np.testing.assert_allclose(vi[grp, gg, :, gg, :],
                                   -np.asarray(v_ref.im[bi]), atol=2e-4)
        # off-diagonal blocks are exactly zero
        for hh in range(g):
            if hh != gg:
                assert np.abs(vr[grp, gg, :, hh, :]).max() == 0.0


def test_admm_iteration_batch_matches_vmapped_pair_t():
    """The hand-batched iteration (cplx.admm_iteration_batch, the
    bench 'batchz' form) == vmap(admm_iteration_pair_t) per iteration:
    same X-update, Y-prox, XLA Z-prox, and dual updates."""
    import jax

    from twoace_tpu.ops.cplx import (admm_iteration_batch,
                                     admm_iteration_pair_t,
                                     panel_gram_basis_pair)
    from twoace_tpu.ops.prox import profile_ladder

    rng = np.random.default_rng(23)
    nt = nr = 8
    n = nt * nr
    m = 2 * n
    batch, r = 3, 5
    ladder = profile_ladder(nt, nr, m, n, False)

    bits = rng.integers(0, 4, (m, n))
    a_np = np.exp(1j * bits * (np.pi / 2)) / np.sqrt(n)
    a = cplx.Pair(jnp.asarray(a_np.real, jnp.float32),
                  jnp.asarray(a_np.imag, jnp.float32))
    u_np = np.linalg.inv(a_np.conj().T @ a_np + np.eye(n))
    u = cplx.Pair(jnp.asarray(u_np.real, jnp.float32),
                  jnp.asarray(u_np.imag, jnp.float32))
    b = jnp.asarray(np.abs(rng.normal(size=(batch, m))) + 0.1, jnp.float32)

    def mk(shape):
        return cplx.Pair(jnp.asarray(rng.normal(size=shape), jnp.float32),
                         jnp.asarray(rng.normal(size=shape), jnp.float32))

    y0, z0 = mk((batch, r, m)), mk((batch, r, n))
    md0, nd0 = mk((batch, r, m)), mk((batch, r, n))
    mu0 = jnp.full((batch,), 1e-2, jnp.float32)

    def to_panel(zi):
        return cplx.Pair(
            zi.re.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt),
            zi.im.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt))

    basis0 = jax.vmap(lambda zi: panel_gram_basis_pair(to_panel(zi))[1])(z0)

    # reference: the per-instance step under vmap (3 iterations)
    def run_ref(bb, state):
        step = admm_iteration_pair_t(a, bb, u, nt, nr, ladder,
                                     eig_mode="perturb", pallas_prox=False,
                                     pallas_zprox=False)
        for _ in range(3):
            state = step(state)
        return state

    ref = jax.vmap(run_ref, in_axes=(0, 0))(
        b, (y0, z0, md0, nd0, mu0, basis0))

    # hand-batched step, XLA Z-prox
    step_b = admm_iteration_batch(a, b, u, nt, nr, ladder, zprox_mode="xla")
    st = (y0, z0, md0, nd0, mu0[:, None, None], basis0)
    for _ in range(3):
        st = step_b(st)

    for got, want, name in ((st[0], ref[0], "y"), (st[1], ref[1], "z"),
                            (st[2], ref[2], "m_dual"),
                            (st[3], ref[3], "n_dual")):
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re),
                                   atol=2e-4, err_msg=name)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(want.im),
                                   atol=2e-4, err_msg=name)
