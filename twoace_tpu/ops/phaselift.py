"""PhaseLift: trace-regularized PSD least squares for phase retrieval.

TPU-native replacement of the TFOCS ``solver_TraceLS`` path used by the
reference (ref: main/src/my_recovery_algorithms/MyPhaseLift.m:69-108):

    minimize_{X >= 0}  0.5 * || b - A(X) ||_2^2 + lam * trace(X)

with the lifted linear operator ``A(X)_i = a_i^T X conj(a_i)`` (so that
``A(x x^H) = |a_i^T x|^2``).

Two solvers:
  - ``phaselift_fista``: exact lifted accelerated proximal gradient; the
    prox of ``lam*tr + PSD-indicator`` is an eigenvalue soft-threshold.
    O(n^2) memory — fine up to n ~ 1k on TPU.
  - ``phaselift_bm``: Burer-Monteiro factored X = V V^H with V (n, k),
    plain gradient descent with momentum; scalable path for n ~ 10^3+
    (SURVEY §7 "hard parts": full lift at n=1024 is 10^6-dim).

Both are pure jitted functions; rank-1 extraction follows MyPhaseLift.m:106-107.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import PhaseLiftConfig


class PhaseLiftResult(NamedTuple):
    x: jax.Array          #: (n,) leading-eigvec extraction sqrt(w1) v1
    lifted: jax.Array     #: (n, n) the PSD iterate (or V V^H for BM)
    objective: jax.Array


def _apply_linop(a, x_lift):
    """A(X)_i = a_i^T X conj(a_i)."""
    return jnp.real(jnp.einsum("in,nm,im->i", a, x_lift, jnp.conj(a)))


def _adjoint(a, r):
    """Adjoint of `_apply_linop` under <X, Y> = Re tr(X^H Y):
    A*(r)[n, m] = sum_i r_i conj(a_i[n]) a_i[m]."""
    return jnp.einsum("in,i,im->nm", jnp.conj(a), r.astype(a.dtype), a)


def _lipschitz(a, iters: int = 16):
    """Power iteration on X -> A*(A(X)) for the FISTA step size."""
    n = a.shape[1]
    x = jnp.eye(n, dtype=a.dtype)

    def body(x, _):
        y = _adjoint(a, _apply_linop(a, x))
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-30), None

    x, _ = lax.scan(body, x, None, length=iters)
    y = _adjoint(a, _apply_linop(a, x))
    return jnp.linalg.norm(y)


def _extract(x_lift):
    w, v = jnp.linalg.eigh(x_lift)
    return jnp.sqrt(jnp.maximum(w[-1], 0.0)).astype(v.dtype) * v[:, -1]


@partial(jax.jit, static_argnames=("cfg",))
def phaselift_fista(a, b, cfg: PhaseLiftConfig = PhaseLiftConfig()
                    ) -> PhaseLiftResult:
    """Accelerated proximal gradient on the lifted SDP.

    ``a``: (m, n) sensing rows; ``b``: (m,) *intensity* measurements (|y|^2),
    matching the reference's ``(measurements/2e5).^2*1e10`` input convention
    (ref: Recover_Channel.m:35).
    """
    m, n = a.shape
    b = jnp.real(b)
    t = 1.0 / _lipschitz(a)
    x0 = jnp.zeros((n, n), a.dtype)

    def prox(x, step):
        x = 0.5 * (x + jnp.conj(x.T))
        w, v = jnp.linalg.eigh(x)
        w = jnp.maximum(w - step * cfg.lam, 0.0)
        return (v * w.astype(v.dtype)) @ jnp.conj(v.T)

    def obj(x):
        return (0.5 * jnp.sum((b - _apply_linop(a, x)) ** 2)
                + cfg.lam * jnp.real(jnp.trace(x)))

    def body(carry, _):
        x, z, tk, last = carry
        r = _apply_linop(a, z) - b
        g = _adjoint(a, r)
        x_new = prox(z - (t * g.astype(a.dtype)), t)
        tk_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        z_new = x_new + ((tk - 1.0) / tk_new).astype(a.dtype) * (x_new - x)
        delta = jnp.linalg.norm(x_new - x) / jnp.maximum(
            jnp.linalg.norm(x_new), 1e-30)
        return (x_new, z_new, tk_new, delta), None

    (x, _, _, _), _ = lax.scan(body, (x0, x0, jnp.asarray(1.0), 1.0), None,
                               length=cfg.max_iters)
    return PhaseLiftResult(x=_extract(x), lifted=x, objective=obj(x))


@partial(jax.jit, static_argnames=("cfg",))
def phaselift_bm(key, a, b, cfg: PhaseLiftConfig = PhaseLiftConfig()
                 ) -> PhaseLiftResult:
    """Burer-Monteiro factored PhaseLift: X = V V^H, V of shape (n, k).

    minimize_V 0.5 || b - A(V V^H) ||^2 + lam ||V||_F^2 by Nesterov-momentum
    gradient descent with a power-iteration step size.  Avoids any n x n
    eigendecomposition, so it scales to large n (32x32 arrays and beyond).
    """
    m, n = a.shape
    b = jnp.real(b)
    k = cfg.bm_rank
    scale = jnp.sqrt(jnp.mean(b) / jnp.maximum(jnp.mean(
        jnp.sum(jnp.abs(a) ** 2, 1)), 1e-30))
    v0 = (jax.random.normal(key, (n, k)) + 1j
          * jax.random.normal(jax.random.fold_in(key, 1), (n, k))
          ).astype(a.dtype) * scale.astype(a.dtype) / n

    lip = _lipschitz(a)
    lr = 0.5 / (lip * jnp.maximum(jnp.mean(b), 1e-30))

    def loss_grad(v):
        av = a @ v                                      # (m, k)
        ax = jnp.sum(jnp.abs(av) ** 2, axis=1)          # A(V V^H)
        r = ax - b
        # grad_V = 2 A^H diag(r) A V + 2 lam V
        g = 2.0 * (jnp.conj(a.T) @ (r[:, None].astype(a.dtype) * av)) \
            + 2.0 * cfg.lam * v
        return 0.5 * jnp.sum(r ** 2) + cfg.lam * jnp.sum(jnp.abs(v) ** 2), g

    def body(carry, _):
        v, mom = carry
        _, g = loss_grad(v)
        mom = 0.9 * mom - lr.astype(a.dtype) * g
        return (v + mom, mom), None

    (v, _), _ = lax.scan(body, (v0, jnp.zeros_like(v0)), None,
                         length=cfg.max_iters)
    # extract leading column by thin-Gram eig
    g = jnp.conj(v.T) @ v
    w, s = jnp.linalg.eigh(0.5 * (g + jnp.conj(g.T)))
    lead = (v @ s[:, -1]) / jnp.maximum(jnp.sqrt(w[-1]), 1e-30).astype(a.dtype)
    x = jnp.sqrt(jnp.maximum(w[-1], 0.0)).astype(a.dtype) * lead
    loss, _ = loss_grad(v)
    return PhaseLiftResult(x=x, lifted=v @ jnp.conj(v.T), objective=loss)
