"""Property tests for the numpy statistical kernels (SURVEY.md §5.2
layer 2): binom_sf vs the mpmath oracle over adversarial (k, N, p);
PAVA and curve-fit invariants; BH invariants."""

from __future__ import annotations

import math
import warnings

import mpmath
import numpy as np
import pytest
from hypothesis import given, settings, strategies as hs

from pfithic_spark import stats as st


def mp_binom_sf_ge(k: int, n: int, p: float) -> float:
    """P(X >= k) via mpmath: exact binomial sum for small n (the
    hypergeometric betainc path can fail to converge mid-distribution),
    high-precision regularized incomplete beta otherwise."""
    if k <= 0:
        return 1.0
    if k > n:
        return 0.0
    if p <= 0:
        return 0.0
    if p >= 1:
        return 1.0
    with mpmath.workdps(50):
        if n <= 2000:
            pm = mpmath.mpf(p)
            total = mpmath.mpf(0)
            for i in range(int(k), int(n) + 1):
                total += mpmath.binomial(n, i) * pm**i * (1 - pm) ** (n - i)
            return float(total)
        # large n: betainc in its convergent tail; where the
        # hypergeometric still diverges (near the median with large a,b)
        # fall back to quadrature of the beta density split at its mode
        a, b = mpmath.mpf(k), mpmath.mpf(n - k + 1)
        try:
            if p < float((a + 1) / (a + b + 2)):
                return float(mpmath.betainc(a, b, 0, p, regularized=True))
            return float(1 - mpmath.betainc(b, a, 0, 1 - p, regularized=True))
        except (ValueError, mpmath.libmp.libhyper.NoConvergence):
            # Exact truncated binomial sum via the term recurrence
            # t_{i+1} = t_i * (n-i)/(i+1) * p/q, summed AWAY from the
            # distribution mode (n*p) so terms decay monotonically and
            # the sum truncates after O(sqrt(n*p*q)) terms.  (The old
            # quadrature fallback here was wrong by ~5e-6 on deep-tail
            # cases while its own error estimate claimed 1e-10.)
            pm = mpmath.mpf(p)
            q = 1 - pm
            ratio = pm / q
            tiny = mpmath.mpf("1e-70")

            def log_term(i):
                return (
                    mpmath.loggamma(n + 1)
                    - mpmath.loggamma(i + 1)
                    - mpmath.loggamma(n - i + 1)
                    + i * mpmath.log(pm)
                    + (n - i) * mpmath.log(q)
                )

            if k > n * p:  # upper tail: sum upward from k, decaying
                t = mpmath.e ** log_term(k)
                total = t
                i = k
                while i < n:
                    t *= ratio * (n - i) / (i + 1)
                    total += t
                    i += 1
                    if t < total * tiny:
                        break
                return float(total)
            # lower tail: P(X>=k) = 1 - P(X<=k-1); sum downward from
            # k-1 (away from the mode), decaying
            t = mpmath.e ** log_term(k - 1)
            total = t
            i = k - 1
            while i > 0:
                t *= i / (ratio * (n - i + 1))
                total += t
                i -= 1
                if t < total * tiny:
                    break
            return float(1 - total)


@given(
    k=hs.integers(min_value=0, max_value=10_000),
    n=hs.integers(min_value=1, max_value=50_000_000),
    p=hs.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=150, deadline=None)
def test_binom_sf_vs_mpmath(k, n, p):
    if k > n:
        k = n  # keep the interesting lattice dense
    got = float(st.binom_sf_ge(np.array([k]), np.array([n]), np.array([p]))[0])
    want = mp_binom_sf_ge(k, n, p)
    assert 0.0 <= got <= 1.0
    # relative for non-tiny values, absolute floor for the deep tail
    assert got == pytest.approx(want, rel=5e-6, abs=1e-280)


@pytest.mark.parametrize(
    "k,n,p",
    [
        (0, 10, 0.5),
        (10, 10, 0.5),
        (1, 10, 0.0),
        (0, 10, 0.0),
        (5, 10, 1.0),
        (1, 5_000_000, 1e-9),
        (3, 1_000_000, 1e-6),
        (100, 10_000, 0.001),
        (999, 1000, 0.999),
        (1, 1, 0.3),
    ],
)
def test_binom_sf_edges(k, n, p):
    got = float(st.binom_sf_ge(np.array([k]), np.array([n]), np.array([p]))[0])
    want = mp_binom_sf_ge(k, n, p)
    assert got == pytest.approx(want, rel=5e-6, abs=1e-300)


@given(
    hs.lists(hs.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=200)
)
@settings(max_examples=100, deadline=None)
def test_pava_properties(ys):
    y = np.array(ys)
    m = st.pava_non_increasing(y)
    # non-increasing
    assert np.all(np.diff(m) <= 1e-9)
    # mean-preserving (unit weights)
    assert float(m.mean()) == pytest.approx(float(y.mean()), rel=1e-9, abs=1e-9)
    # projection is idempotent
    m2 = st.pava_non_increasing(m)
    np.testing.assert_allclose(m2, m, rtol=1e-12, atol=1e-12)
    # already-monotone input is a fixed point
    yd = np.sort(y)[::-1]
    np.testing.assert_allclose(st.pava_non_increasing(yd), yd, rtol=1e-12)


def test_fit_monotone_curve_properties():
    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0, 1e6, 80))
    y = 1.0 / (1.0 + x / 5e4) + rng.normal(0, 0.01, 80)
    w = rng.integers(1, 100, 80).astype(float)
    gx, gy = st.fit_monotone_curve(x, y, w)
    assert np.all(np.diff(gy) <= 1e-12)  # non-increasing curve
    assert gx[0] == pytest.approx(x[0]) and gx[-1] == pytest.approx(x[-1])
    # clamped eval outside the fit range
    lo = st.interp_clamped(np.array([-1e9]), gx, gy)[0]
    hi = st.interp_clamped(np.array([1e18]), gx, gy)[0]
    assert lo == pytest.approx(gy[0]) and hi == pytest.approx(gy[-1])


def test_gammaln_accuracy():
    xs = np.array([0.1, 0.5, 1.0, 2.0, 10.5, 1e3, 1e6, 5e7])
    got = st.gammaln(xs)
    want = np.array([float(mpmath.loggamma(x)) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-10)


def test_binom_sf_extreme_corners_finite_and_warning_free():
    """stats.py betainc corner (round-2 ADVICE/VERDICT): front factor
    under/overflowing separately from the continued fraction must never
    produce NaN or a RuntimeWarning for any valid (cc, N, p)."""
    k = np.array([1.0, 1.0, 5000.0, 1.0, 2.0, 990.0, 1e6, 3.0])
    n = np.array([1e6, 1e9, 1e4, 10.0, 1e8, 1e3, 1e6, 1e7])
    p = np.array([1e-300, 1e-15, 1 - 1e-12, 1e-300, 0.9999, 1e-6, 0.5, 1e-250])
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = st.binom_sf_ge(k, n, p)
    assert np.isfinite(out).all()
    assert ((out >= 0.0) & (out <= 1.0)).all()
    # magnitude sanity at two analytic anchors:
    # P(X>=1) = 1-(1-p)^n ~= n*p for tiny p
    assert out[0] == pytest.approx(1e6 * 1e-300, rel=1e-6)
    # deep lower tail underflows cleanly to 0, not NaN
    assert out[2] >= 0.0


def test_smooth_penalized_banded_cholesky_matches_dense_solve():
    """The scalar banded Cholesky (host-independent by construction —
    FIXTURES.md §6) must agree with LAPACK's dense solve to numerical
    precision on SPD pentadiagonal systems of every parity/size."""
    rng = np.random.default_rng(7)
    for n in (3, 4, 10, 57, 120):
        y = rng.normal(size=n)
        w = rng.uniform(0.5, 2.0, size=n)
        lam = 1.7
        D = np.zeros((n - 2, n))
        for i in range(n - 2):
            D[i, i], D[i, i + 1], D[i, i + 2] = 1.0, -2.0, 1.0
        A = np.diag(w) + lam * (D.T @ D)
        want = np.linalg.solve(A, w * y)
        got = st.smooth_penalized(y, w, lam)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_det_dot_exact_and_order_free():
    """det_dot is the exactly-rounded dot: invariant under permutation
    (BLAS is not), and exact on a catastrophic-cancellation probe."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=1000) * 10.0 ** rng.integers(-8, 8, size=1000)
    b = rng.normal(size=1000)
    perm = rng.permutation(1000)
    assert st.det_dot(a, b) == st.det_dot(a[perm], b[perm])
    # 1e16 + 1 - 1e16 == 1 exactly under fsum (naive/pairwise lose it)
    probe = np.array([1e16, 1.0, -1e16])
    ones = np.ones(3)
    assert st.det_dot(probe, ones) == 1.0
    assert st.det_sum(probe) == 1.0


def test_binom_sf_sql_registration(spark):
    """api.register_sql_functions exposes the p-value kernel to
    spark.sql; the SQL result must equal the direct kernel call."""
    from pfithic_spark.api import register_sql_functions

    register_sql_functions(spark)
    got = spark.sql(
        "SELECT binom_sf(CAST(3 AS DOUBLE), CAST(100 AS DOUBLE), "
        "CAST(0.01 AS DOUBLE)) AS p"
    ).collect()[0]["p"]
    want = float(st.binom_sf_ge(np.array([3.0]), 100.0, 0.01)[0])
    assert got == want


def test_binom_sf_sql_null_propagation(spark):
    from pfithic_spark.api import register_sql_functions

    register_sql_functions(spark)
    row = spark.sql(
        "SELECT binom_sf(CAST(NULL AS DOUBLE), 10.0, 0.5) AS a, "
        "binom_sf(3.0, 10.0, CAST(NULL AS DOUBLE)) AS b"
    ).collect()[0]
    assert row["a"] is None and row["b"] is None


# --- BH-FDR property test (hypothesis) -----------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ps=hs.lists(
        hs.floats(
            min_value=0.0, max_value=1.0, allow_nan=False, allow_subnormal=False
        ),
        min_size=1,
        max_size=60,
    ),
    extra_m=hs.integers(min_value=0, max_value=50),
)
def test_bh_fdr_matches_numpy_reference(spark, ps, extra_m):
    """Both BH forms (single-window and two-phase scalable) must match
    a pure-numpy Benjamini–Hochberg reference — q_i = min_{j>=i}
    min(1, p_j·M/j) over ascending p — for ARBITRARY p-value sets
    (duplicates, zeros, ones) and M ≥ n (the possible-pairs semantics
    where M exceeds the observed row count)."""
    import numpy as np

    from pfithic_spark import windows as win

    n = len(ps)
    m = n + extra_m
    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(ps)], "rid long, p_value double"
    )
    order = np.lexsort((np.arange(n), np.array(ps)))  # p then rid
    q_sorted = np.minimum(
        np.array(ps)[order] * m / np.arange(1, n + 1), 1.0
    )
    # suffix min over ascending-p order
    q_sorted = np.minimum.accumulate(q_sorted[::-1])[::-1]
    want = dict(zip(np.arange(n)[order].tolist(), q_sorted.tolist()))
    for form in (win.bh_fdr, win.bh_fdr_scalable):
        got = {
            r["rid"]: r["q_value"]
            for r in form(df, "p_value", m=m, tiebreak=["rid"]).collect()
        }
        assert set(got) == set(want)
        for rid, q in want.items():
            assert abs(got[rid] - q) < 1e-12, (form.__name__, rid, got[rid], q)
