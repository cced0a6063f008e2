"""Mechanical transcript of inferLowRankV4_multi.m with MATLAB semantics.

WHY THIS FILE EXISTS.  ``tests/reference_numpy.py`` is the float64 oracle the
JAX solvers are parity-tested against; it was written as an algorithmic
re-derivation of the reference.  If that re-derivation misread the MATLAB
anywhere, oracle and JAX would agree and the parity tests would be circular
(VERDICT r1, "What's missing" #1).  GNU Octave / MATLAB are not available in
this environment, so the de-circularization is a SECOND, mechanical,
line-by-line transliteration of
``/root/reference/main/src/my_recovery_algorithms/ADMM_v2/inferLowRankV4_multi.m``
that preserves MATLAB's exact semantics instead of re-deriving the algorithm:

  - column-major ``reshape`` (``order='F'``) — in particular ``ArgMinZ``'s
    ``E = reshape(Z, tx, [])`` (ref :426), whose panel rows are the
    FASTEST-varying vec index (the Rx antenna under the reference's
    ``kron(conj(A_Tx), A_Rx)`` vec convention, despite the variable being
    named ``tx``) — numerically identical to the repo's Rx-row panels when
    Nt == Nr (every production shape), divergent otherwise;
  - the sorted-spectrum ladder with the ``s2_scale`` accumulator indexed back
    into the ORIGINAL (unsorted eig) order via ``idx`` (ref :469-480), and
    the conditional reconstruction ``if any(s2_scale < 1)`` (ref :482-484);
  - the zero-magnitude branches of ``ArgMinY``/``normalize_rows``
    (ref :516-519, :526-528, :543-546, :551-554);
  - the scaffold quirk that the refinement gate reads the LAST restart's
    ``quality``/``use_rank_one``, not the best one's (ref :89, :92, :100);
  - eig with no implied ordering, immediately sorted descending where the
    reference sorts (ref :428-430, :570-572), and NOT sorted where it does
    not (the column-orthonormalization ``eig(X'*X)``, ref :263).

Every function carries the ref line numbers it transcribes.  Randomness
(``randsample``, ref :48) is injected as explicit index arrays so golden
traces are reproducible without emulating MATLAB's twister PRNG.

Agreement between THIS file, ``reference_numpy.py``, and the JAX solvers is
what ``test_golden_matlab.py`` asserts, against golden .npz traces committed
in ``tests/golden/``.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# function [X] = SpectralInitialize(A,B,r)            ref :561-574


def spectral_initialize_m(a, b, r):
    a_s = a.copy()                                     # As = A;
    for i in range(a.shape[0]):                        # for i = 1:size(A,1)
        an = np.linalg.norm(a[i, :])                   #   an = norm(A(i,:));
        if an != 0:                                    #   if an ~= 0
            a_s[i, :] = a[i, :] * (b[i] / an)          #     As(i,:)=A(i,:)*(B(i)/an)
    ata = a_s.conj().T @ a_s                           # AtA = As'*As;
    s2, v = np.linalg.eig(ata)                         # [V,S] = eig(AtA);
    s2 = np.maximum(0, s2.real)                        # s2 = max(0,real(diag(S)));
    idx = np.argsort(-s2, kind="stable")               # [s2,idx]=sort(s2,'descend');
    s2 = s2[idx]
    # X = bsxfun(@times, V(:,idx(1:r)), sqrt(s2(1:r))');
    return v[:, idx[:r]] * np.sqrt(s2[:r])[None, :]


# ---------------------------------------------------------------------------
# function [Z] = ArgMinZ(X, N, mu, tx, rx, m, n, use_rank_one)   ref :423-485


def ladder_lists_m(tx, rx, m, n, use_rank_one):
    """The constraint-ladder selection (ref :437-464)."""
    sz = min(rx, tx)                                   # sz = min(rx, tx);
    r0 = int(np.ceil(np.sqrt(sz) * 0.5))               # r0 = ceil(sqrt(sz)*0.5);
    r1 = int(np.ceil(np.sqrt(sz) * 0.7))
    r2 = int(np.ceil(np.sqrt(sz)))
    r3 = min(sz, int(np.ceil(np.sqrt(sz) * 2.0)))
    f0, f1, f2, f3 = 0.8, 0.9, 0.95, 0.995
    if use_rank_one:                                   # if use_rank_one
        return [1], [0.95]
    elif m >= n * 3:                                   # elseif m >= n * 3
        return [r3], [f3]
    elif r1 <= 2:                                      # elseif r1 <= 2
        return [r2], [f2]
    elif r0 <= 2:                                      # elseif r0 <= 2
        return [r1, r2, r3], [f1, f2, f3]
    return [r0, r1, r2, r3], [f0, f1, f2, f3]


def argmin_z_m(x, n_dual, mu, tx, rx, m, n, use_rank_one):
    z = x + n_dual / mu                                # Z = X+N/mu;   (n, r)
    # E = reshape(Z, tx, []);  MATLAB reshape is COLUMN-major
    e = z.reshape(tx, -1, order="F")                   # (tx, rx*r) panels

    g = e @ e.conj().T                                 # [U,S] = eig(E*E');
    s2_u, u = np.linalg.eig(g)
    s2 = np.maximum(0, s2_u.real)                      # s2 = max(0,real(diag(S)));
    idx = np.argsort(-s2, kind="stable")               # [s2,idx]=sort(s2,'descend')
    s2 = s2[idx]

    r_list, f_list = ladder_lists_m(tx, rx, m, n, use_rank_one)

    s2_scale = np.ones_like(s2)                        # s2_scale = ones(size(s2));
    for k in range(len(r_list)):                       # for k = 1:length(r_list)
        r = r_list[k]
        f = f_list[k]
        vr = s2[:r].sum()                              # vr = sum(s2(1:r));
        v = s2.sum()                                   # v = sum(s2);
        if vr < v * f:                                 # if vr < v * f
            scale = min(1.0, vr / (v - vr) * (1 / f - 1))
            s2[r:] = s2[r:] * scale                    # s2((r+1):end) *= scale
            # s2_scale(idx((r+1):end)) *= scale   (ORIGINAL eig order!)
            s2_scale[idx[r:]] = s2_scale[idx[r:]] * scale

    if np.any(s2_scale < 1):                           # if (any(s2_scale < 1))
        # Z = reshape(bsxfun(@times,U,sqrt(s2_scale)')*U'*E, tx*rx, []);
        z = ((u * np.sqrt(s2_scale)[None, :]) @ u.conj().T @ e) \
            .reshape(tx * rx, -1, order="F")
    return z


# ---------------------------------------------------------------------------
# function [Y] = ArgMinY(AX, B, M, mu, scale_by_row)   ref :511-533


def argmin_y_m(ax, b, m_dual, mu, scale_by_row):
    y = ax + m_dual / mu                               # Y = AX + M/mu;
    r = y.shape[1]                                     # r = size(Y,2);
    if scale_by_row:
        d = np.sqrt((np.abs(y) ** 2).sum(axis=1))      # D = sqrt(sum(abs(Y).^2,2))
        i_zero = np.flatnonzero(d == 0)                # I = find(D==0);
        if i_zero.size:                                # if ~isempty(I)
            y[i_zero, :] = 1 / np.sqrt(r)              #   Y(I,:) = 1/sqrt(r);
            d[i_zero] = 1                              #   D(I) = 1;
        bd = b / d                                     # BD = B./D;
        return y * ((bd + mu) / (1 + mu))[:, None]     # bsxfun(@times, ...)
    d = np.abs(y)                                      # D = abs(Y);
    i_zero = d == 0                                    # I = find(D==0);
    if i_zero.any():
        y[i_zero] = 1                                  # Y(I) = 1;
        d[i_zero] = 1                                  # D(I) = 1;
    bd = b[:, None] / d                                # BD = bsxfun(@rdivide,B,D)
    return y * ((bd + mu) / (1 + mu))                  # Y = Y.*((BD+mu)/(1+mu));


# function [Y] = normalize_rows(Y, B, scale_by_row)    ref :538-559


def normalize_rows_m(y, b, scale_by_row):
    y = y.copy()
    r = y.shape[1]
    if scale_by_row:
        d = np.sqrt((np.abs(y) ** 2).sum(axis=1))
        i_zero = np.flatnonzero(d == 0)
        if i_zero.size:
            y[i_zero, :] = 1 / np.sqrt(r)
            d[i_zero] = 1
        return y * (b / d)[:, None]
    d = np.abs(y)
    i_zero = d == 0
    if i_zero.any():
        y[i_zero] = 1
        d[i_zero] = 1
    return y * (b[:, None] / d)


# ---------------------------------------------------------------------------
# function [X] = ArgMinX(A, Y, Z, M, N, mu, lambda, U, D)   ref :401-409
# (lambda == 0 path only; the lambda > 0 branch is dead in every reference
#  call site — ADMM_v2.m:30-32 always passes the default lambda = 0)


def argmin_x_m(a, y, z, m_dual, n_dual, mu, u_mat):
    return u_mat @ (a.conj().T @ (y - m_dual / mu) + (z - n_dual / mu))


# ---------------------------------------------------------------------------
# function [X,Y,converged] = InferADMM(...)            ref :281-386


def infer_admm_m(a, b, x0, scale_by_row, use_rank_one, tx, rx,
                 mu0=1e-3, rho=1.03, tol_rel=1e-4, tol_abs=1e-8, maxiter=500,
                 u_mat=None, trace=None):
    """``trace``: optional dict collecting per-iteration diagnostics."""
    m, n = a.shape                                     # [m,n] = size(A);
    r = x0.shape[1]                                    # r = size(X0,2);

    if u_mat is None:                                  # if isempty(U) (lambda==0)
        u_mat = np.linalg.inv(a.conj().T @ a + np.eye(n))

    m_dual = np.zeros((m, r), dtype=complex)           # M = zeros(m,r);
    n_dual = np.zeros((n, r), dtype=complex)           # N = zeros(n,r);
    x = x0.copy()                                      # X = X0;
    ax = a @ x                                         # AX = A*X;
    if scale_by_row:
        x = x * (np.linalg.norm(b) / np.linalg.norm(ax, "fro"))
    else:
        for j in range(r):                             # for j = 1:r
            x[:, j] = x[:, j] * (np.linalg.norm(b) / np.linalg.norm(ax[:, j]))
    ax = a @ x                                         # AX = A*X;
    y = normalize_rows_m(ax, b, scale_by_row)          # Y = normalize_rows(...)
    z = argmin_z_m(x, n_dual, 1, tx, rx, m, n, use_rank_one)   # mu = 1 here!
    aty = a.conj().T @ y                               # AtY = A'*Y;

    mu = mu0
    opt_obj = np.inf
    converged = False
    last_res = np.inf
    opt_x, opt_y = x, y                                # (MATLAB: undefined until
    #                                                     first improvement, but
    #                                                     iter 1 always improves
    #                                                     on inf)

    for it in range(1, maxiter + 1):                   # for iter = 1:maxiter
        y0, z0, aty0 = y, z, aty

        x = argmin_x_m(a, y, z, m_dual, n_dual, mu, u_mat)    # update X
        ax = a @ x
        y = argmin_y_m(ax, b, m_dual, mu, scale_by_row)       # update Y
        aty = a.conj().T @ y
        z = argmin_z_m(x, n_dual, mu, tx, rx, m, n, use_rank_one)  # update Z

        j_m = ax - y                                   # J_M = AX - Y;
        m_dual = m_dual + mu * j_m                     # M = M + mu*J_M;
        j_n = x - z                                    # J_N = X - Z;
        n_dual = n_dual + mu * j_n                     # N = N + mu*J_N;

        if scale_by_row:                               # best-so-far :344-351
            obj = np.linalg.norm(
                np.sqrt((np.abs(ax) ** 2).sum(axis=1)) - b)
            if obj < opt_obj:
                opt_obj, opt_x, opt_y = obj, x, y
        else:                                          # :352-361
            objs = np.sqrt(((np.abs(ax) - b[:, None]) ** 2).sum(axis=0))
            j = int(np.argmin(objs))
            if objs[j] < opt_obj:
                opt_obj, opt_x, opt_y = objs[j], x[:, j], y[:, j]

        # convergence test :363-375
        res_prim = np.sqrt(np.linalg.norm(j_m, "fro") ** 2
                           + np.linalg.norm(j_n, "fro") ** 2)
        res_dual = mu * np.sqrt(np.linalg.norm(aty - aty0, "fro") ** 2
                                + np.linalg.norm(z - z0, "fro") ** 2)
        res_comb = np.sqrt(res_prim ** 2
                           + np.linalg.norm(y - y0, "fro") ** 2
                           + np.linalg.norm(z - z0, "fro") ** 2)
        nax = np.linalg.norm(ax, "fro")
        ny = np.linalg.norm(y, "fro")
        nx = np.linalg.norm(x, "fro")
        nz = np.linalg.norm(z, "fro")
        thresh_prim = (tol_abs * np.sqrt((m + n) * r)
                       + tol_rel * np.sqrt(max(nax, ny) ** 2
                                           + max(nx, nz) ** 2))
        thresh_dual = (tol_abs * np.sqrt(n * r * 2)
                       + tol_rel * np.sqrt(np.linalg.norm(aty, "fro") ** 2
                                           + nz ** 2))
        thresh_comb = (tol_abs * np.sqrt((m + n) * r * 2)
                       + tol_rel * np.sqrt(max(nax, ny) ** 2
                                           + max(nx, nz) ** 2
                                           + ny ** 2 + nz ** 2))
        if trace is not None:
            trace.setdefault("res_comb", []).append(res_comb)
            trace.setdefault("mu", []).append(mu)

        if (res_prim < thresh_prim and res_dual < thresh_dual) \
                or res_comb < thresh_comb:
            converged = True
            break

        if res_comb > last_res * 0.9:                  # mu adaptation :379-381
            mu = mu * rho
        last_res = res_comb

    return opt_x, opt_y, converged


# ---------------------------------------------------------------------------
# function [X,Y,converged] = inferLowRankImpl(...)      ref :111-271


def infer_lowrank_impl_m(a, b, xs, tx, rx, r, mu0, rho, tol_rel, tol_abs,
                         maxiter, use_rank_one):
    n = a.shape[1]
    u_mat = np.linalg.inv(a.conj().T @ a + np.eye(n))  # :242 (lambda==0)
    x = xs                                             # :252
    x, y, _ = infer_admm_m(a, b, x, True, use_rank_one, tx, rx, mu0, rho,
                           tol_rel, tol_abs, maxiter, u_mat)   # :258
    # [Vx,Dx] = eig(X'*X); X = X*Vx;   :263-264  (NO sort — eig order as-is)
    _, vx = np.linalg.eig(x.conj().T @ x)
    x = x @ vx
    x, y, converged = infer_admm_m(a, b, x, False, use_rank_one, tx, rx,
                                   mu0, rho, tol_rel, tol_abs, maxiter,
                                   u_mat)              # :270
    return x, y, converged


# ---------------------------------------------------------------------------
# function [X, Y, quality] = inferLowRankV4_multi(A, B, tx, rx, ...)  ref :5-109


def infer_lowrank_v4_multi_m(a, b, tx, rx, train_indices, r=20, mu0=1e-3,
                             rho=1.03, cc_frac=0.95, tol_rel=1e-4,
                             tol_abs=1e-8, maxiter=500):
    """``train_indices``: list of 3 integer index arrays standing in for
    ``randsample(m, floor(m*cc_frac))`` (ref :48) — injected so golden
    traces do not depend on MATLAB's PRNG.

    NOTE the reference's scaffold quirks are preserved EXACTLY:
      - the refinement gate tests the LAST restart's ``quality`` (ref :89),
        not the best restart's;
      - the refinement passes the LAST restart's ``use_rank_one`` (ref
        :92, :100);
      - rollback compares ``norm(X0'*X)`` of the column vectors (ref :93),
        i.e. |<X0, X>| for single columns.
    """
    m, n = a.shape
    r = min(r, m, n)                                   # r = min([r m n]);

    a_norm = np.linalg.norm(a, "fro") / np.sqrt(m)     # :27
    if a_norm < tol_abs:
        a_norm = 1.0
    b_norm = np.linalg.norm(b)                         # :32
    if b_norm < tol_abs:
        b_norm = 1.0
    a = a / a_norm                                     # :37
    b = b / b_norm                                     # :38

    max_quality = -1.0                                 # :40
    x_max = y_max = None
    quality = None
    use_rank_one = None

    for i in range(3):                                 # for i = 1:3
        train_idx = np.asarray(train_indices[i])       # randsample stand-in :48
        test_idx = np.setdiff1d(np.arange(m), train_idx)   # :49 (sorted)
        a_train, b_train = a[train_idx, :], b[train_idx]
        a_test, b_test = a[test_idx, :], b[test_idx]

        xs = spectral_initialize_m(a_train, b_train, r)    # :58

        use_rank_one = False                           # :66
        x, y, _ = infer_lowrank_impl_m(a_train, b_train, xs, tx, rx, r, mu0,
                                       rho, tol_rel, tol_abs, maxiter,
                                       use_rank_one)   # :67
        quality = 1 - np.linalg.norm(np.abs(a_test @ x) - b_test) \
            / np.linalg.norm(b_test)                   # :68

        if quality < 0.6:                              # :73
            use_rank_one = True
            x, y, _ = infer_lowrank_impl_m(a_train, b_train, xs, tx, rx, r,
                                           mu0, rho, tol_rel, tol_abs,
                                           maxiter, use_rank_one)
            quality = 1 - np.linalg.norm(np.abs(a_test @ x) - b_test) \
                / np.linalg.norm(b_test)               # :76

        if max_quality < quality:                      # :79
            x_max, y_max = x, y
            max_quality = quality

    # Refinement gate reads the LAST restart's quality (ref :89) — quirk.
    if quality > 0.6:
        x0, y0 = x_max, y_max                          # :90-91
        x, y, _ = infer_admm_m(a, b, x0[:, None] if x0.ndim == 1 else x0,
                               True, use_rank_one, tx, rx, mu0, rho,
                               tol_rel, tol_abs, maxiter)      # :92
        x = x[:, 0] if x.ndim == 2 else x
        x0v = x0 if x0.ndim == 1 else x0[:, 0]
        similarity = (np.linalg.norm(np.vdot(x0v, x))
                      / np.linalg.norm(x0v) / np.linalg.norm(x))   # :93
        if similarity < 0.6:                           # :94
            x, y = x0v, y_max                          # rollback :96-97
    else:
        x, y, _ = infer_admm_m(a, b,
                               x_max[:, None] if x_max.ndim == 1 else x_max,
                               True, use_rank_one, tx, rx, mu0, rho,
                               tol_rel, tol_abs, maxiter)      # :100
        x = x[:, 0] if x.ndim == 2 else x

    x = x * (b_norm / a_norm)                          # :106
    return x, max_quality
