"""Pair-representation complex arithmetic: complex tensors as (re, im) pairs.

Why: the TPU MXU is a real-valued systolic array — XLA lowers complex
matmuls to real ones anyway, and some TPU runtimes (including the tunneled
backend this repo benches on) do not implement complex dtypes at all.  The
production hot path therefore carries complex matrices as explicit
``(re, im)`` float32 pairs: every operation below maps to plain real
matmuls/elementwise ops that tile perfectly onto the MXU/VPU.

Contents:
  - pair matmuls (3-multiplication Karatsuba form), conjugate-transpose
    matmuls, elementwise helpers
  - pair-form magnitude prox (ArgMinY semantics,
    ref: inferLowRankV4_multi.m:511-533)
  - pair-form spectral-profile prox via the real symmetric *embedding*
    [[Hr, -Hi], [Hi, Hr]] of a Hermitian matrix: spectral functions commute
    with the embedding, so the prox runs a real Jacobi eigendecomposition
    (ref: inferLowRankV4_multi.m:423-485)
  - a fused pair-form 2ACE ADMM iteration (the benchmark/production step,
    ref loop: inferLowRankV4_multi.m:318-341)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .eigh_jacobi import eigh_jacobi


class Pair(NamedTuple):
    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape


def from_complex(x) -> Pair:
    x = jnp.asarray(x)
    return Pair(jnp.real(x).astype(jnp.float32),
                jnp.imag(x).astype(jnp.float32))


def to_complex(p: Pair):
    return p.re + 1j * p.im


def add(a: Pair, b: Pair) -> Pair:
    return Pair(a.re + b.re, a.im + b.im)


def sub(a: Pair, b: Pair) -> Pair:
    return Pair(a.re - b.re, a.im - b.im)


def scale(a: Pair, s) -> Pair:
    """Multiply by a real scalar/array (broadcast)."""
    return Pair(a.re * s, a.im * s)


def conj(a: Pair) -> Pair:
    return Pair(a.re, -a.im)


def abs2(a: Pair):
    return a.re * a.re + a.im * a.im


def matmul(a: Pair, b: Pair) -> Pair:
    """A @ B with 3 real matmuls (Karatsuba 3M form):
    k1 = Ar(Br+Bi); k2 = (Ar+Ai)Bi; k3 = (Ai-Ar)Br;
    re = k1 - k2, im = k1 + k3."""
    k1 = a.re @ (b.re + b.im)
    k2 = (a.re + a.im) @ b.im
    k3 = (a.im - a.re) @ b.re
    return Pair(k1 - k2, k1 + k3)


def matmul_herm_t(a: Pair, b: Pair) -> Pair:
    """A^H @ B: (Ar^T - i Ai^T)(Br + i Bi)."""
    at = Pair(jnp.swapaxes(a.re, -1, -2), -jnp.swapaxes(a.im, -1, -2))
    return matmul(at, b)


def embed_hermitian(h: Pair):
    """Real symmetric embedding [[Hr, -Hi], [Hi, Hr]] of a Hermitian pair."""
    top = jnp.concatenate([h.re, -h.im], axis=-1)
    bot = jnp.concatenate([h.im, h.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def unembed(m, n: int) -> Pair:
    """Inverse of :func:`embed_hermitian` (averages the redundant blocks)."""
    return Pair(0.5 * (m[..., :n, :n] + m[..., n:, n:]),
                0.5 * (m[..., n:, :n] - m[..., :n, n:]))


def magnitude_prox_rows(ax: Pair, b, m_dual: Pair, mu) -> Pair:
    """Pair-form row-magnitude prox (scale_by_row=True ArgMinY).

    ``ax``, ``m_dual``: (m, r) pairs; ``b``: (m,) real.
    ref: inferLowRankV4_multi.m:511-523.
    """
    inv_mu = 1.0 / mu
    yr = ax.re + m_dual.re * inv_mu
    yi = ax.im + m_dual.im * inv_mu
    d2 = jnp.sum(yr * yr + yi * yi, axis=-1, keepdims=True)
    d = jnp.sqrt(jnp.maximum(d2, 1e-30))
    coeff = (b[..., None] / d + mu) / (1.0 + mu)
    return Pair(yr * coeff, yi * coeff)


def spectral_profile_prox_pair(z: Pair, nt: int, nr: int,
                               ladder: Sequence[Tuple[int, float]],
                               sweeps: int = 6, v0=None,
                               return_basis: bool = False):
    """Pair-form 2ACE spectral-profile prox.

    Same semantics as :func:`..ops.prox.spectral_profile_prox`, but the
    (nr x nr) Hermitian Gram eigendecomposition runs on the real 2nr x 2nr
    symmetric embedding with the real Jacobi solver — no complex dtype
    anywhere.  Embedded eigenvalues come in duplicated pairs; the ladder is
    evaluated on the deduplicated (every other sorted) spectrum.

    ``v0``: optional warm-start eigenbasis (2nr, 2nr real orthogonal) from a
    previous call.  The Gram changes little between consecutive ADMM
    iterations, so congruence-transforming into the previous basis leaves a
    near-diagonal matrix that one cheap Jacobi sweep re-diagonalizes —
    the TPU replacement for re-running a full eig per iteration
    (ref cost: inferLowRankV4_multi.m:428-430 runs MATLAB ``eig`` per iter).
    With ``return_basis=True`` returns ``(result, v)``.
    """
    n, r = z.shape
    # columns -> channel-panel E (nr, nt*r): z[:, c] k-index = it*nr + ir
    def to_panel(x):
        return x.T.reshape(r, nt, nr).transpose(2, 0, 1).reshape(nr, r * nt)

    def from_panel(e):
        return e.reshape(nr, r, nt).transpose(1, 2, 0).reshape(r, nt * nr).T

    e = Pair(to_panel(z.re), to_panel(z.im))
    g = matmul(e, conj(Pair(jnp.swapaxes(e.re, -1, -2),
                            jnp.swapaxes(e.im, -1, -2))))
    # hermitize (numerical) then embed
    g = Pair(0.5 * (g.re + jnp.swapaxes(g.re, -1, -2)),
             0.5 * (g.im - jnp.swapaxes(g.im, -1, -2)))
    g_emb = embed_hermitian(g)
    if v0 is not None:
        # rotate into the previous eigenbasis; one sweep finishes the job
        g_emb = jnp.swapaxes(v0, -1, -2) @ g_emb @ v0
        w, s_rot = eigh_jacobi(g_emb, sweeps=sweeps)
        v = v0 @ s_rot
    else:
        w, v = eigh_jacobi(g_emb, sweeps=sweeps)   # real, descending, 2nr
    w = jnp.maximum(w, 0.0)
    w_c = w[0::2]                                   # deduplicated spectrum

    scale_c = jnp.ones_like(w_c)
    v_tot = jnp.sum(w_c)
    for rk, f in ladder:
        vr = jnp.sum(w_c[:rk])
        need = vr < v_tot * f
        s = jnp.minimum(1.0, vr / jnp.maximum(v_tot - vr, 1e-30)
                        * (1.0 / f - 1.0))
        s = jnp.where(need, s, 1.0)
        tail = jnp.arange(w_c.shape[0]) >= rk
        mult = jnp.where(tail, s, 1.0)
        w_c = w_c * mult
        scale_c = scale_c * mult
        v_tot = jnp.sum(w_c)

    # duplicate scales back onto the embedded spectrum, build
    # Delta = V diag(sqrt(scale)-1) V^T, exact identity when scale == 1
    coeff = jnp.repeat(jnp.sqrt(scale_c) - 1.0, 2)
    delta_emb = (v * coeff[None, :]) @ v.T
    delta = unembed(delta_emb, nr)
    e_new = add(e, matmul(delta, e))
    out = Pair(from_panel(e_new.re), from_panel(e_new.im))
    if return_basis:
        return out, v
    return out


def admm_iteration_pair(a: Pair, b, u_mat: Pair, nt: int, nr: int,
                        ladder: Sequence[Tuple[int, float]],
                        sweeps: int = 6, warm_basis: bool = False):
    """Build the fused pair-form 2ACE ADMM iteration.

    Returns ``step(state) -> state`` with state =
    (y, z, m_dual, n_dual, mu) pairs/real — one full X/Y/Z/dual update
    (ref: inferLowRankV4_multi.m:318-341) in pure real arithmetic.

    ``warm_basis=True`` appends the Z-prox eigenbasis (2nr, 2nr) to the
    state and warm-starts each iteration's eigendecomposition from the
    previous one, so ``sweeps`` can drop to 1 with no accuracy loss on
    the slowly-varying ADMM Gram (initialize the extra state entry with
    ``jnp.eye(2 * nr)``).
    """
    ah = Pair(jnp.swapaxes(a.re, -1, -2), -jnp.swapaxes(a.im, -1, -2))

    def step(state):
        if warm_basis:
            y, z, m_dual, n_dual, mu, v_basis = state
        else:
            y, z, m_dual, n_dual, mu = state
            v_basis = None
        inv_mu = 1.0 / mu
        # X-update: U (A^H (Y - M/mu) + (Z - N/mu))
        t = Pair(y.re - m_dual.re * inv_mu, y.im - m_dual.im * inv_mu)
        rhs = add(matmul(ah, t), Pair(z.re - n_dual.re * inv_mu,
                                      z.im - n_dual.im * inv_mu))
        x = matmul(u_mat, rhs)
        ax = matmul(a, x)
        y_new = magnitude_prox_rows(ax, b, m_dual, mu)
        z_in = Pair(x.re + n_dual.re * inv_mu, x.im + n_dual.im * inv_mu)
        if warm_basis:
            z_new, v_new = spectral_profile_prox_pair(
                z_in, nt, nr, ladder, sweeps=sweeps, v0=v_basis,
                return_basis=True)
        else:
            z_new = spectral_profile_prox_pair(z_in, nt, nr, ladder,
                                               sweeps=sweeps)
        m_new = Pair(m_dual.re + mu * (ax.re - y_new.re),
                     m_dual.im + mu * (ax.im - y_new.im))
        n_new = Pair(n_dual.re + mu * (x.re - z_new.re),
                     n_dual.im + mu * (x.im - z_new.im))
        if warm_basis:
            return (y_new, z_new, m_new, n_new, mu * 1.03, v_new)
        return (y_new, z_new, m_new, n_new, mu * 1.03)

    return step
