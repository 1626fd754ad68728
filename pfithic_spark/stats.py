"""Numpy statistical kernels (SURVEY.md §2.9) — the only non-relational
math in the engine.

The reference scores each contact with ``scipy.stats.binom.sf(cc-1, N,
p)`` [P `fithic.py::fit_Spline` scoring block] and fits a smoothing
spline with a monotone correction [P, SC-4].  scipy is unavailable in
this environment, so the kernels are implemented directly in numpy:

- regularized incomplete beta via the Lentz continued fraction
  (the classical public-domain algorithm, cf. Numerical Recipes §6.4,
  here an independent numpy vectorization),
- log-gamma via the Lanczos approximation (g=7, n=9 coefficients,
  public domain),
- monotone projection via pool-adjacent-violators (PAVA),
- smoothing via a second-difference-penalized least squares solve
  (a discrete smoothing spline on the support grid).

Everything is vectorized over numpy arrays so it drops into Arrow
``pandas_udf`` batches — the JVM↔Python boundary is crossed per-batch,
never per-row.  Accuracy is validated against mpmath in
``tests/test_stats.py`` over adversarial (k, N, p).
"""

from __future__ import annotations

import math

import numpy as np


def det_dot(a: np.ndarray, b: np.ndarray) -> float:
    """Exactly-rounded dot product via Shewchuk summation (math.fsum).

    BLAS ``a @ b`` picks its accumulation order from the CPU's SIMD
    width, so the low bits of a dot product differ ACROSS HOSTS — fatal
    for goldens that must hash-match when the driver re-runs a query on
    different hardware.  fsum is exact, hence order- and
    host-independent.  O(n) C-speed; every call site here is a
    driver-side vector of ≤ a few thousand elements."""
    return math.fsum((np.asarray(a, dtype=np.float64) * b).tolist())


def det_sum(a: np.ndarray) -> float:
    """Exactly-rounded (host-independent) sum — see det_dot."""
    return math.fsum(np.asarray(a, dtype=np.float64).tolist())

# Lanczos approximation coefficients (g=7, n=9) — standard public values.
_LANCZOS_G = 7.0
_LANCZOS = np.array(
    [
        0.99999999999980993,
        676.5203681218851,
        -1259.1392167224028,
        771.32342877765313,
        -176.61502916214059,
        12.507343278686905,
        -0.13857109526572012,
        9.9843695780195716e-6,
        1.5056327351493116e-7,
    ]
)


def gammaln(x: np.ndarray) -> np.ndarray:
    """log|Γ(x)| for x > 0, vectorized (Lanczos, ~1e-13 relative)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    small = x < 0.5
    # reflection for x < 0.5: Γ(x)Γ(1-x) = π / sin(πx)
    xs = np.where(small, 1.0 - x, x)
    z = xs - 1.0
    acc = np.full_like(z, _LANCZOS[0])
    for i in range(1, len(_LANCZOS)):
        acc = acc + _LANCZOS[i] / (z + i)
    t = z + _LANCZOS_G + 0.5
    lg = 0.5 * np.log(2.0 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(acc)
    if np.any(small):
        with np.errstate(divide="ignore", invalid="ignore"):
            refl = np.log(np.pi / np.abs(np.sin(np.pi * x)))
        lg = np.where(small, refl - lg, lg)
    out[...] = lg
    return out


def _betacf(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta (modified Lentz),
    vectorized with ACTIVE-SET compaction: converged lanes retire from
    the working arrays each iteration, so late stragglers don't keep the
    whole batch's temporaries alive (most lanes converge in <50 of the
    300 max iterations — ~6× less memory traffic on large batches)."""
    MAXIT, EPS, FPMIN = 300, 3.0e-14, 1.0e-300
    shape = x.shape
    a = np.ravel(a).astype(np.float64)
    b = np.ravel(b).astype(np.float64)
    x = np.ravel(x).astype(np.float64)
    n = x.size
    out = np.empty(n, dtype=np.float64)
    act = np.arange(n)
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones(n)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < FPMIN, FPMIN, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        np.copyto(d, FPMIN, where=np.abs(d) < FPMIN)
        c = 1.0 + aa / c
        np.copyto(c, FPMIN, where=np.abs(c) < FPMIN)
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        np.copyto(d, FPMIN, where=np.abs(d) < FPMIN)
        c = 1.0 + aa / c
        np.copyto(c, FPMIN, where=np.abs(c) < FPMIN)
        d = 1.0 / d
        delta = d * c
        h *= delta
        conv = np.abs(delta - 1.0) < EPS
        if conv.any():
            out[act[conv]] = h[conv]
            keep = ~conv
            if not keep.any():
                act = act[:0]
                break
            act = act[keep]
            a, b, x = a[keep], b[keep], x[keep]
            qab, qap, qam = qab[keep], qap[keep], qam[keep]
            c, d, h = c[keep], d[keep], h[keep]
    if act.size:
        out[act] = h  # non-converged stragglers: best current estimate
    return out.reshape(shape)


def betainc(a, b, x) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    a, b, x = np.broadcast_arrays(a, b, x)
    out = np.empty(x.shape, dtype=np.float64)
    out[x <= 0.0] = 0.0
    out[x >= 1.0] = 1.0
    mid = (x > 0.0) & (x < 1.0)
    if mid.any():
        am, bm, xm = a[mid], b[mid], x[mid]
        with np.errstate(divide="ignore", over="ignore"):
            lbeta = gammaln(am + bm) - gammaln(am) - gammaln(bm)
            # log of the front factor x^a (1-x)^b / B(a,b); combined
            # with log(cf) BEFORE exponentiating — front alone can
            # underflow to 0 while front*cf is representable, and the
            # 0 * inf product was a NaN source.
            lfront = lbeta + am * np.log(xm) + bm * np.log1p(-xm)
        use_direct = xm < (am + 1.0) / (am + bm + 2.0)
        res = np.empty_like(xm)

        def _tail(i, aa, bb, xx):
            cf = _betacf(aa, bb, xx)
            with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
                t = np.exp(lfront[i] + np.log(np.maximum(cf, 0.0)) - np.log(aa))
            # cf <= 0 only if the continued fraction degenerated; the
            # true tail is then below double resolution
            return np.where(cf > 0.0, t, 0.0)

        if use_direct.any():
            i = use_direct
            res[i] = _tail(i, am[i], bm[i], xm[i])
        if (~use_direct).any():
            i = ~use_direct
            res[i] = 1.0 - _tail(i, bm[i], am[i], 1.0 - xm[i])
        out[mid] = np.clip(res, 0.0, 1.0)
    return out


def binom_sf_ge(k, n, p) -> np.ndarray:
    """P(X >= k) for X ~ Binomial(n, p), vectorized.

    Reference semantics: p_value = scipy.stats.binom.sf(cc - 1, N, prior)
    = P(X >= cc) = I_p(cc, N - cc + 1)  [P fit_Spline scoring].
    Handles the edge lattice exactly: k<=0 → 1; k>n → 0; p<=0 → (k<=0);
    p>=1 → (k<=n).
    """
    k = np.asarray(k, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    k, n, p = np.broadcast_arrays(k, n, p)
    out = betainc(k, n - k + 1.0, p)
    out = np.where(k <= 0.0, 1.0, out)
    out = np.where(k > n, 0.0, out)
    out = np.where((p <= 0.0) & (k > 0.0), 0.0, out)
    out = np.where((p >= 1.0) & (k <= n), 1.0, out)
    return np.clip(out, 0.0, 1.0)


def pava_non_increasing(y: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    """Weighted pool-adjacent-violators projection onto non-increasing
    sequences (the SC-4 monotone correction).  O(n); n <= noOfBins."""
    y = np.asarray(y, dtype=np.float64)
    w = np.ones_like(y) if w is None else np.asarray(w, dtype=np.float64)
    vals: list[float] = []
    wts: list[float] = []
    sizes: list[int] = []
    for yi, wi in zip(y, w):
        vals.append(float(yi))
        wts.append(float(wi))
        sizes.append(1)
        # pool while the tail increases (violates non-increasing)
        while len(vals) > 1 and vals[-2] < vals[-1]:
            pooled = (vals[-1] * wts[-1] + vals[-2] * wts[-2]) / (
                wts[-1] + wts[-2]
            )
            wts[-2] += wts[-1]
            sizes[-2] += sizes[-1]
            vals[-2] = pooled
            vals.pop()
            wts.pop()
            sizes.pop()
    out = np.empty_like(y)
    i = 0
    for v, sz in zip(vals, sizes):
        out[i : i + sz] = v
        i += sz
    return out


def smooth_penalized(
    y: np.ndarray, w: np.ndarray | None = None, lam: float = 1.0
) -> np.ndarray:
    """Discrete smoothing spline: argmin Σ w_i (y_i - f_i)^2 + λ Σ (Δ²f)².

    Solves (W + λ D₂ᵀD₂) f = W y on the support grid — the scipy-free
    stand-in for UnivariateSpline [SC-4]; n ≤ noOfBins so the dense
    solve is trivial driver-side work.
    """
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 3:
        return y.copy()
    w = np.ones(n) if w is None else np.asarray(w, dtype=np.float64)
    # A = diag(w) + λ·D₂ᵀD₂ is symmetric positive-definite pentadiagonal
    # (bandwidth 2).  It is solved with an explicit banded Cholesky in
    # scalar Python floats rather than np.linalg.solve: LAPACK's blocked
    # factorization orders its reductions by the CPU's SIMD kernels, so
    # its low bits differ across hosts, which would leak into the fitted
    # null curve and break cross-host golden hashes.  Scalar IEEE ops
    # are bit-identical everywhere; n ≤ noOfBins keeps this trivial.
    coef = (1.0, -2.0, 1.0)
    a0 = [0.0] * n  # main diagonal of A
    a1 = [0.0] * n  # A[j, j+1]
    a2 = [0.0] * n  # A[j, j+2]
    for i in range(n - 2):
        for u in range(3):
            a0[i + u] += lam * coef[u] * coef[u]
            if u < 2:
                a1[i + u] += lam * coef[u] * coef[u + 1]
            if u < 1:
                a2[i + u] += lam * coef[u] * coef[u + 2]
    for j in range(n):
        a0[j] += float(w[j])
    # banded Cholesky: L has the same bandwidth-2 profile
    l0 = [0.0] * n  # L[j, j]
    l1 = [0.0] * n  # L[j+1, j]
    l2 = [0.0] * n  # L[j+2, j]
    for j in range(n):
        s = a0[j]
        if j >= 1:
            s -= l1[j - 1] * l1[j - 1]
        if j >= 2:
            s -= l2[j - 2] * l2[j - 2]
        l0[j] = math.sqrt(s)
        if j + 1 < n:
            s = a1[j]
            if j >= 1:
                s -= l1[j - 1] * l2[j - 1]
            l1[j] = s / l0[j]
        if j + 2 < n:
            l2[j] = a2[j] / l0[j]
    b = (w * y).tolist()
    # forward substitution L z = b
    z = [0.0] * n
    for j in range(n):
        s = b[j]
        if j >= 1:
            s -= l1[j - 1] * z[j - 1]
        if j >= 2:
            s -= l2[j - 2] * z[j - 2]
        z[j] = s / l0[j]
    # back substitution Lᵀ f = z
    f = [0.0] * n
    for j in range(n - 1, -1, -1):
        s = z[j]
        if j + 1 < n:
            s -= l1[j] * f[j + 1]
        if j + 2 < n:
            s -= l2[j] * f[j + 2]
        f[j] = s / l0[j]
    return np.asarray(f, dtype=np.float64)


def fit_monotone_curve(
    x: np.ndarray,
    y: np.ndarray,
    w: np.ndarray | None = None,
    lam: float = 1.0,
    grid_points: int = 1000,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit the monotone non-increasing null curve on support points
    (smooth → PAVA → dense linear grid) [SC-4].

    Returns (grid_x, grid_y) ready to broadcast for distributed
    interpolation.  Runs driver-side on the collected ≤noOfBins rows —
    the one sanctioned driver sync point (SURVEY.md §1.2).
    """
    order = np.argsort(x)
    x = np.asarray(x, dtype=np.float64)[order]
    y = np.asarray(y, dtype=np.float64)[order]
    w = None if w is None else np.asarray(w, dtype=np.float64)[order]
    smoothed = smooth_penalized(y, w, lam)
    mono = pava_non_increasing(smoothed, w)
    gx = np.linspace(x[0], x[-1], grid_points)
    gy = np.interp(gx, x, mono)
    return gx, gy


def interp_clamped(xq: np.ndarray, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """np.interp with end clamping (reference clamps out-of-range
    distances to the fitted range [P fit_Spline])."""
    return np.interp(np.asarray(xq, dtype=np.float64), gx, gy)


def kr_balance_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    n: int,
    tol: float = 1e-8,
    max_outer: int = 100,
) -> np.ndarray:
    """Knight–Ruiz matrix balancing on a symmetric matrix in COO form
    (ref surface: utils/HiCKRy.py, which wraps the KR 2012 algorithm via
    scipy.sparse; this is an independent scipy-free implementation).

    Input triplets must contain BOTH (i,j) and (j,i) for off-diagonal
    entries (or be expanded by the caller).  Returns x with
    diag(x)·A·diag(x) ~ doubly stochastic (unit row sums), via the
    inner-outer Newton scheme with a conjugate-gradient inner solve —
    only mat-vecs against the COO triplets, so memory stays O(nnz).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)

    def matvec(x: np.ndarray) -> np.ndarray:
        out = np.zeros(n, dtype=np.float64)
        np.add.at(out, rows, vals * x[cols])
        return out

    # scale-free start: e / sqrt(row sums) would also work; KR paper uses e
    x = np.ones(n, dtype=np.float64)
    e = np.ones(n, dtype=np.float64)
    g = 0.9
    etamax = 0.1
    eta = etamax
    stop_tol = tol * 0.5
    v = x * matvec(x)
    rk = 1.0 - v
    rho_km1 = det_dot(rk, rk)
    rout = rold = rho_km1

    for _ in range(max_outer):
        if np.sqrt(rout) < stop_tol * np.sqrt(n):
            break
        # inner CG solve of the Newton system
        k_inner = 0
        y = e.copy()
        inner_tol = max(eta**2 * rout, tol**2)
        rho_km1 = det_dot(rk, rk)
        Z = rk / v
        p = Z.copy()
        rho_km2 = rho_km1 = det_dot(rk, Z)
        # cone safeguards (KR 2012 bnewt defaults): keep the inner
        # iterate y strictly inside the positive cone — without them a
        # CG step on an ill-conditioned matrix (low-degree rows) takes
        # y, and with it x, negative, and the "converged" fixed point
        # is a signed pseudo-balance with negative row sums
        delta, Delta = 0.1, 3.0
        while rho_km1 > inner_tol and k_inner < 1000:
            k_inner += 1
            if k_inner > 1:
                beta = rho_km1 / rho_km2
                p = Z + beta * p
            w = x * matvec(x * p) + v * p
            pw = det_dot(p, w)
            if pw == 0.0 or not np.isfinite(pw):
                break  # degenerate curvature (unbalanceable component)
            alpha = rho_km1 / pw
            ap = alpha * p
            ynew = y + ap
            if float(ynew.min()) <= delta:
                neg = ap < 0
                gamma = float(((delta - y[neg]) / ap[neg]).min())
                y = y + gamma * ap
                break
            if float(ynew.max()) >= Delta:
                # >= on both the trigger and the mask: an iterate
                # landing EXACTLY on Delta must select itself, or the
                # clamp reduces over an empty array (latent in the
                # original bnewt too; surfaced by the unit-row-sum
                # pre-scaling)
                big = ynew >= Delta
                gamma = float(((Delta - y[big]) / ap[big]).min())
                y = y + gamma * ap
                break
            y = ynew
            rk = rk - alpha * w
            rho_km2 = rho_km1
            Z = rk / v
            rho_km1 = det_dot(rk, Z)
        x = x * y
        v = x * matvec(x)
        rk = 1.0 - v
        rho_km1 = det_dot(rk, rk)
        rout = rho_km1
        # adaptive inner tolerance (standard KR safeguards)
        rat = rout / rold
        rold = rout
        eta = g * rat
        if g * eta**2 > 0.1:
            eta = max(eta, g * eta**2)
        eta = max(min(eta, etamax), stop_tol / max(np.sqrt(rout), 1e-300))
    return x


def jacobi_eigh(a, tol: float = 1e-12, max_sweeps: int = 64):
    """Deterministic eigendecomposition of a small symmetric matrix via
    cyclic Jacobi rotations — pure scalar IEEE ops in a FIXED sweep
    order, so the result is bit-identical on any host (FIXTURES.md §6:
    LAPACK's ``eigh`` is banned from golden-gated kernels because its
    blocking/SIMD strategy varies with hardware).

    Returns ``(eigvals, eigvecs)`` as plain nested lists, eigenpairs
    sorted by (-eigenvalue, original index) with each vector's sign
    normalized so its largest-|component| entry is positive.  O(n^3)
    per sweep — intended for driver-side matrices of n ≤ a few hundred
    (the covariance of an embedding column, a kernel matrix, ...).
    """
    n = len(a)
    A = [[float(a[i][j]) for j in range(n)] for i in range(n)]
    V = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    for _ in range(max_sweeps):
        off = math.fsum(
            A[i][j] * A[i][j]
            for i in range(n)
            for j in range(i + 1, n)
        )
        if off <= tol * tol:
            break
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = A[p][q]
                if apq == 0.0:
                    continue
                theta = (A[q][q] - A[p][p]) / (2.0 * apq)
                t = 1.0 / (abs(theta) + math.sqrt(theta * theta + 1.0))
                if theta < 0.0:
                    t = -t
                c = 1.0 / math.sqrt(t * t + 1.0)
                s = t * c
                for k in range(n):
                    akp, akq = A[k][p], A[k][q]
                    A[k][p] = c * akp - s * akq
                    A[k][q] = s * akp + c * akq
                for k in range(n):
                    akp, akq = A[p][k], A[q][k]
                    A[p][k] = c * akp - s * akq
                    A[q][k] = s * akp + c * akq
                for k in range(n):
                    vkp, vkq = V[k][p], V[k][q]
                    V[k][p] = c * vkp - s * vkq
                    V[k][q] = s * vkp + c * vkq
    order = sorted(range(n), key=lambda i: (-A[i][i], i))
    eigvals = [A[i][i] for i in order]
    eigvecs = []
    for i in order:
        v = [V[k][i] for k in range(n)]
        m = max(range(n), key=lambda k: (abs(v[k]), -k))
        if v[m] < 0.0:
            v = [-x for x in v]
        eigvecs.append(v)
    return eigvals, eigvecs
