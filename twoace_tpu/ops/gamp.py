"""Generalized Approximate Message Passing (complex), from first principles.

Replaces the vendored GAMP MATLAB suite (ref:
main/3rd_software_component/GAMP/...) used by the reference for:
  - ``EMBGAMP``: Bernoulli-Gaussian input channel with EM hyper-parameter
    learning — stage 2 of PLGAMP and the conventional-CS baseline
    (ref: My_TwoStage_Recovery.m:163-181, My_Conventional_CS.m:14-30)
  - ``prGAMP4``: phase-retrieval GAMP with magnitude-only output channel
    (ref: MyPRGAMP.m:63-76)

This is a clean-room JAX implementation of the standard sum-product GAMP
recursion (Rangan 2011) with a complex Bernoulli-Gaussian prior and EM
updates of (sparsity, signal variance, noise variance) in the style of
Vila & Schniter 2013.  Fixed trip count + damping for jit friendliness.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class GampResult(NamedTuple):
    x: jax.Array
    tau_x: jax.Array
    sparsity: jax.Array
    noise_var: jax.Array


def _bg_denoiser(r, tau_r, lam, phi):
    """Posterior mean/var of x under prior lam*CN(0, phi) + (1-lam)*delta_0
    and pseudo-observation r ~ CN(x, tau_r)."""
    tau_r = jnp.maximum(tau_r, 1e-20)
    phi_p = phi + tau_r
    # activity likelihood ratio (complex gaussians)
    log_num = -jnp.abs(r) ** 2 / phi_p - jnp.log(phi_p)
    log_den = -jnp.abs(r) ** 2 / tau_r - jnp.log(tau_r)
    ratio = (lam / jnp.maximum(1.0 - lam, 1e-12)) * jnp.exp(
        jnp.clip(log_num - log_den, -50.0, 50.0))
    pi = ratio / (1.0 + ratio)
    gamma = r * (phi / phi_p).astype(r.dtype)
    nu = phi * tau_r / phi_p
    x_hat = pi.astype(r.dtype) * gamma
    tau_x = pi * (nu + jnp.abs(gamma) ** 2) - jnp.abs(x_hat) ** 2
    return x_hat, jnp.maximum(tau_x, 1e-20), pi, gamma, nu


def _awgn_output(p, tau_p, y, psi):
    """AWGN output channel y = z + w, w ~ CN(0, psi)."""
    tau_p = jnp.maximum(tau_p, 1e-20)
    z_hat = (psi.astype(p.dtype) * p + tau_p.astype(p.dtype) * y) \
        / (psi + tau_p).astype(p.dtype)
    tau_z = psi * tau_p / (psi + tau_p)
    return z_hat, tau_z


def _magnitude_output(p, tau_p, y_mag, psi):
    """Magnitude output channel y = |z| + w (phase-retrieval GAMP).

    Posterior approximated by keeping p's phase and blending magnitudes with
    precision weights — the same scalar form as the ADMM magnitude prox —
    plus the half-variance phase-uncertainty correction of prGAMP.
    """
    tau_p = jnp.maximum(tau_p, 1e-20)
    p_mag = jnp.abs(p)
    p_dir = p / jnp.maximum(p_mag, 1e-20).astype(p.dtype)
    mag = (psi * p_mag + tau_p * y_mag) / (psi + tau_p)
    z_hat = mag.astype(p.dtype) * p_dir
    tau_z = 0.5 * (psi * tau_p / (psi + tau_p)
                   + tau_p * y_mag / jnp.maximum(p_mag + y_mag, 1e-20))
    return z_hat, tau_z


@partial(jax.jit, static_argnames=("iters", "learn_lambda", "output",
                                   "adaptive_damping"))
def gamp(a, y, *, lam0: float, phi0=None, psi0: float = 1e-2,
         iters: int = 200, damping: float = 0.7,
         learn_lambda: bool = True, output: str = "awgn",
         x0=None, adaptive_damping: bool = False) -> GampResult:
    """Run GAMP.  ``a``: (m, n); ``y``: (m,) complex (awgn) or real magnitudes
    (output="magnitude").

    ``adaptive_damping`` carries the damping factor in the loop state and
    backs it off whenever the data residual grows — the role of EMBGAMP's
    robust/adaptive step mode, which the reference enables
    (My_TwoStage_Recovery.m:171).  Root-caused need: on the coherent
    virtual-angle dictionary at m/P ~ 0.2 (the VSM M = 529/784 cells) a
    fixed damping of 0.7 diverges oscillatorily (measured rel-residual
    5e4 and EM noise-variance blow-up), while ~0.2 converges to 0.09 —
    the cause of the r03 perfect-phase-CS collapse.
    """
    m, n = a.shape
    abs2 = jnp.abs(a) ** 2
    y_pow = jnp.mean(jnp.abs(y) ** 2)
    if phi0 is None:
        # EM init (Vila-Schniter): split measured power between signal+noise
        phi0 = (y_pow - psi0) * n / jnp.maximum(
            jnp.sum(abs2) * lam0 / m, 1e-20) / n
        phi0 = jnp.maximum(phi0, 1e-12)

    if x0 is None:
        x0 = jnp.zeros((n,), a.dtype)
    else:
        x0 = jnp.asarray(x0, a.dtype)
    state = dict(x=x0, tau_x=jnp.full((n,), phi0 * lam0), s=jnp.zeros((m,), a.dtype),
                 lam=jnp.asarray(lam0, jnp.float32).astype(abs2.dtype),
                 phi=jnp.asarray(phi0, abs2.dtype),
                 psi=jnp.asarray(psi0, abs2.dtype),
                 damp=jnp.asarray(damping, abs2.dtype),
                 last_resid=jnp.asarray(jnp.inf, abs2.dtype))

    def body(st, _):
        # output linear step
        tau_p = abs2 @ st["tau_x"]
        p = a @ st["x"] - st["s"] * tau_p.astype(a.dtype)
        if output == "awgn":
            z_hat, tau_z = _awgn_output(p, tau_p, y, st["psi"])
        else:
            z_hat, tau_z = _magnitude_output(p, tau_p, y, st["psi"])
        s = (z_hat - p) / tau_p.astype(a.dtype)
        tau_s = jnp.maximum((1.0 - tau_z / tau_p) / tau_p, 1e-20)
        # input linear step
        tau_r = 1.0 / jnp.maximum(abs2.T @ tau_s, 1e-20)
        r = st["x"] + tau_r.astype(a.dtype) * (jnp.conj(a.T) @ s)
        # denoise
        x_new, tau_x_new, pi, gamma, nu = _bg_denoiser(r, tau_r, st["lam"],
                                                       st["phi"])
        # damping
        damp = st["damp"]
        x = damp.astype(a.dtype) * x_new + (1 - damp).astype(a.dtype) * st["x"]
        tau_x = damp * tau_x_new + (1 - damp) * st["tau_x"]
        # EM updates (Vila-Schniter)
        lam = st["lam"]
        if learn_lambda:
            lam = jnp.clip(jnp.mean(pi), 1e-4, 1.0 - 1e-4)
        phi = jnp.maximum(jnp.sum(pi * (nu + jnp.abs(gamma) ** 2))
                          / jnp.maximum(jnp.sum(pi), 1e-12), 1e-12)
        if output == "awgn":
            resid = y - a @ x
        else:
            resid = y - jnp.abs(a @ x)
        resid2 = jnp.mean(jnp.abs(resid) ** 2)
        psi = jnp.maximum(resid2, 1e-12)
        if adaptive_damping:
            # back off on residual growth, creep back up on progress
            # (EMBGAMP robust/adaptive step role)
            grow = resid2 > st["last_resid"]
            damp = jnp.where(grow, jnp.maximum(damp * 0.8, 0.1),
                             jnp.minimum(damp * 1.02, damping))
        return dict(x=x, tau_x=tau_x, s=s, lam=lam, phi=phi, psi=psi,
                    damp=damp, last_resid=resid2), None

    state, _ = lax.scan(body, state, None, length=iters)
    return GampResult(x=state["x"], tau_x=state["tau_x"],
                      sparsity=state["lam"], noise_var=state["psi"])


def embgamp(y, a, snr_db: float, lam0: float, learn_lambda: bool = True,
            iters: int = 200):
    """EMBGAMP-compatible wrapper (ref: My_Conventional_CS.m:14-24):
    complex AWGN output, Bernoulli-Gaussian input, EM learning, adaptive
    damping (the reference's robust_gamp mode, My_TwoStage_Recovery.m:171)."""
    psi0 = jnp.mean(jnp.abs(y) ** 2) / (1.0 + 10.0 ** (snr_db / 10.0))
    res = gamp(a, y, lam0=lam0, psi0=psi0, iters=iters,
               learn_lambda=learn_lambda, output="awgn",
               adaptive_damping=True)
    return res.x


class VampResult(NamedTuple):
    x: jax.Array
    precision: jax.Array   #: final denoiser-input precision gamma1


@partial(jax.jit, static_argnames=("iters",))
def vamp(a, y, *, lam0: float, phi0: float, gamma_w, iters: int = 50,
         damping: float = 0.8) -> VampResult:
    """Vector AMP for ``y = A x + w`` with a Bernoulli-Gaussian prior.

    Replaces the vendored VAMP of the reference's GAMP suite (ref:
    {main,Numerical_Simulation}/3rd_software_component/GAMP/trunk/code/VAMP).
    Clean-room implementation of Rangan-Schniter-Fletcher 2016: the LMMSE
    stage is solved exactly through one precomputed SVD of A, so every
    iteration is O(mn) matvecs — unlike GAMP, VAMP stays stable on the
    ill-conditioned directional codebook matrices (§2.3 M3) where GAMP's
    iid-Gaussian assumption breaks.

    ``gamma_w``: noise precision 1/psi; ``phi0``: prior signal variance.
    Fixed trip count + gamma damping for jit friendliness.
    """
    m, n = a.shape
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    k = s.shape[0]
    d = (s * s).real                       # (k,) eigenvalues of A^H A
    uty = jnp.conj(u.T) @ y                # (k,)
    aty_v = s.astype(u.dtype) * uty        # V-coords of A^H y

    def lmmse(r2, g2):
        """argmin gw||y-Ax||^2 + g2||x-r2||^2 via the SVD; returns (x2, alpha2)."""
        vr2 = vh @ r2                                          # (k,)
        c = (gamma_w * aty_v + g2.astype(a.dtype) * vr2) \
            / (gamma_w * d + g2).astype(a.dtype)
        x2 = jnp.conj(vh.T) @ (c - vr2) + r2
        # divergence: k spectral components + (n-k) identity passthrough
        alpha2 = (jnp.sum(g2 / (gamma_w * d + g2)) + (n - k)) / n
        return x2, alpha2

    x0 = jnp.conj(a.T) @ y
    state = dict(r1=x0, g1=jnp.asarray(1.0 / jnp.maximum(phi0, 1e-20),
                                       jnp.float64 if d.dtype == jnp.float64
                                       else jnp.float32))

    def body(st, _):
        r1, g1 = st["r1"], st["g1"]
        # denoising stage
        x1, tau_x, _, _, _ = _bg_denoiser(r1, 1.0 / g1, lam0, phi0)
        alpha1 = jnp.clip(g1 * jnp.mean(tau_x), 1e-6, 1.0 - 1e-6)
        eta1 = g1 / alpha1
        g2 = jnp.maximum(eta1 - g1, 1e-12)
        r2 = (eta1.astype(a.dtype) * x1 - g1.astype(a.dtype) * r1) \
            / g2.astype(a.dtype)
        # LMMSE stage
        x2, alpha2 = lmmse(r2, g2)
        alpha2 = jnp.clip(alpha2, 1e-6, 1.0 - 1e-6)
        eta2 = g2 / alpha2
        g1_new = jnp.maximum(eta2 - g2, 1e-12)
        r1_new = (eta2.astype(a.dtype) * x2 - g2.astype(a.dtype) * r2) \
            / g1_new.astype(a.dtype)
        g1_d = damping * g1_new + (1 - damping) * g1
        r1_d = damping * r1_new + (1 - damping) * r1
        return dict(r1=r1_d, g1=g1_d), None

    state, _ = lax.scan(body, state, None, length=iters)
    x_final, _, _, _, _ = _bg_denoiser(state["r1"], 1.0 / state["g1"],
                                       lam0, phi0)
    return VampResult(x=x_final, precision=state["g1"])


def vamp_cs(y, a, snr_db: float, lam0: float, iters: int = 50):
    """VAMP conventional-CS entry, mirroring :func:`embgamp`'s interface
    (same role as My_Conventional_CS.m:14-24, with the vendored suite's
    VAMP in place of EMBGAMP)."""
    y_pow = jnp.mean(jnp.abs(y) ** 2)
    psi0 = y_pow / (1.0 + 10.0 ** (snr_db / 10.0))
    n, m = a.shape[1], a.shape[0]
    col_pow = jnp.mean(jnp.sum(jnp.abs(a) ** 2, axis=0))
    phi0 = jnp.maximum((y_pow - psi0) * m
                       / jnp.maximum(col_pow * lam0 * n, 1e-20), 1e-12)
    res = vamp(a, y, lam0=lam0, phi0=phi0, gamma_w=1.0 / psi0, iters=iters)
    return res.x


def prgamp(y_mag, a, lam0: float = 0.1, iters: int = 300):
    """Phase-retrieval GAMP (magnitude-only output channel).

    ref: MyPRGAMP.m:71 ``prGAMP4(sqrt(y), A, opt)`` — input is the magnitude.
    Spectral initialization breaks the x=0 fixed point of the magnitude
    channel (prGAMP4 similarly random/spectral-restarts).
    """
    from .spectral_init import spectral_initialize

    x0 = spectral_initialize(a, y_mag, 1)[:, 0]
    # scale init so predicted magnitudes match measured energy
    ax = jnp.abs(a @ x0)
    x0 = x0 * (jnp.linalg.norm(y_mag)
               / jnp.maximum(jnp.linalg.norm(ax), 1e-20)).astype(a.dtype)
    res = gamp(a, y_mag, lam0=lam0, psi0=1e-3 * jnp.mean(y_mag ** 2),
               iters=iters, learn_lambda=True, output="magnitude", x0=x0)
    return res.x
