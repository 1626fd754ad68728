"""Generate the committed golden parquet oracles under tests/golden/.

Three registry keys compute values no SQL engine can express (binomial
survival p-values, the monotone spline null fit): their DuckDB oracles
read a committed golden parquet instead of recomputing.  The golden
stores the ENGINE's own bit patterns — that is what makes the driver's
bit-exact hash compare meaningful as a end-to-end reproducibility gate
across sessions/partitionings — but this script refuses to write a
golden until every value passes an INDEPENDENT check:

- q_binom_sf: every p_value within rtol 1e-9 of mpmath's
  arbitrary-precision regularized incomplete beta, and every p_prior
  bit-equal to a DuckDB recomputation of the prior arithmetic.
- q_spline_fit_eval: every spline_prob within rtol 1e-9 of a
  pandas-dataflow refit (tests/pandas_ref.py shapes) and the evaluated
  curve non-increasing in distance.
- q_hic_significance_all: full-row match (keys/cc exact; bias rtol
  1e-12; p/q rtol 1e-9) against run_significance_all_pandas, the
  independent pandas implementation of 'All' mode.

So the committed file is certified-at-generation; pytest re-certifies
continuously (test_stats mpmath gate, test_hic_pipeline pandas-ref
gates), and the driver's hash match certifies the distributed path
still reproduces the certified values bit-for-bit.

Usage: python tools/make_goldens.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def check_binom_sf(pdf: pd.DataFrame) -> None:
    import mpmath

    mpmath.mp.dps = 40

    def sf(cc, n, p):
        if cc <= 0:
            return 1.0
        if p <= 0:
            return 0.0
        if p >= 1:
            return 1.0 if cc <= n else 0.0
        return float(
            mpmath.betainc(cc, n - cc + 1, 0, p, regularized=True)
        )

    n_total = None  # recompute N independently: sum of fixture cc
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    from pfithic_spark.fixtures import CONTACTS_SQL

    fixture = con.execute(CONTACTS_SQL).df()
    n_total = int(fixture["contact_count"].sum())
    # independent prior arithmetic, bit-equal (same IEEE expression as
    # the registered query's DuckDB oracle used to check q_contact_prior)
    want_prior = con.execute(
        f"""
        WITH contacts AS ({CONTACTS_SQL})
        SELECT chr1, mid1, chr2, mid2,
               LEAST(GREATEST(
                 (1.0 / (1.0 + (mid2 - mid1) / 5000.0)) * 0.001,
               0.0), 1.0) AS p_prior
        FROM contacts
        """
    ).df()
    con.close()
    m = pdf.merge(want_prior, on=["chr1", "mid1", "chr2", "mid2"], suffixes=("", "_want"))
    assert len(m) == len(pdf)
    assert (m["p_prior"].to_numpy() == m["p_prior_want"].to_numpy()).all(), (
        "p_prior not bit-equal to the independent DuckDB arithmetic"
    )
    want = np.array(
        [
            sf(int(cc), n_total, float(p))
            for cc, p in zip(pdf["contact_count"], pdf["p_prior"])
        ]
    )
    np.testing.assert_allclose(
        pdf["p_value"].to_numpy(), want, rtol=1e-9, atol=1e-300
    )
    print(f"  q_binom_sf: {len(pdf)} rows certified vs mpmath (N={n_total})")


def check_spline(pdf: pd.DataFrame) -> None:
    from pfithic_spark import stats as st
    from pfithic_spark.fixtures import CONTACTS_SQL, NBINS_GRID, NBINS_OCC, RES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    c = con.execute(CONTACTS_SQL).df()
    con.close()
    c["dist"] = c["mid2"] - c["mid1"]
    n_total = int(c["contact_count"].sum())
    ks = np.arange(1, NBINS_GRID)
    possible = pd.Series(2 * (NBINS_GRID - ks), index=ks * RES, dtype="int64")
    byd = (
        c.groupby("dist")
        .agg(cc=("contact_count", "sum"), np_=("contact_count", "size"))
        .sort_index()
    )
    byd["n_possible"] = possible.reindex(byd.index).fillna(byd["np_"]).astype("int64")
    total = int(byd["cc"].sum())
    target = total / NBINS_OCC
    cum = byd["cc"].cumsum()
    bin_id = np.minimum(
        np.floor((cum - byd["cc"]) / target).astype("int64"), NBINS_OCC - 1
    )
    g = byd.assign(bin_id=bin_id, dxcc=byd.index.values * byd["cc"])
    per_bin = g.groupby("bin_id").agg(
        sum_cc=("cc", "sum"),
        n_pairs=("np_", "sum"),
        n_possible=("n_possible", "sum"),
        dxcc=("dxcc", "sum"),
    )
    gx, gy = st.fit_monotone_curve(
        (per_bin["dxcc"].astype("float64") / per_bin["sum_cc"]).to_numpy(),
        ((per_bin["sum_cc"] / per_bin["n_possible"].clip(lower=1)) / float(n_total)).to_numpy(),
        w=per_bin["n_pairs"].to_numpy(dtype=np.float64),
    )
    want = st.interp_clamped(pdf["d"].to_numpy(dtype=np.float64), gx, gy)
    np.testing.assert_allclose(
        pdf["spline_prob"].to_numpy(), want, rtol=1e-9, atol=1e-300
    )
    srt = pdf.sort_values("d")
    assert (np.diff(srt["spline_prob"].to_numpy()) <= 1e-15).all(), (
        "evaluated null curve must be non-increasing in distance"
    )
    print(f"  q_spline_fit_eval: {len(pdf)} rows certified vs pandas refit")


def check_sig_all(pdf: pd.DataFrame) -> None:
    from pandas_ref import run_significance_all_pandas

    from pfithic_spark.fixtures import BIASES_SQL, CONTACTS_SQL, INTER_CONTACTS_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    intra = con.execute(CONTACTS_SQL).df()
    inter = con.execute(INTER_CONTACTS_SQL).df()
    biases = con.execute(BIASES_SQL).df()
    con.close()
    want = (
        run_significance_all_pandas(intra, inter, biases)
        .sort_values(["chr1", "chr2", "mid1", "mid2"])
        .reset_index(drop=True)
    )
    got = pdf.sort_values(["chr1", "chr2", "mid1", "mid2"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        want[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(got["bias1"], want["bias1"], rtol=1e-12)
    np.testing.assert_allclose(got["bias2"], want["bias2"], rtol=1e-12)
    np.testing.assert_allclose(got["p_value"], want["p_value"], rtol=1e-9, atol=1e-300)
    np.testing.assert_allclose(got["q_value"], want["q_value"], rtol=1e-9, atol=1e-300)
    print(f"  q_hic_significance_all: {len(pdf)} rows certified vs pandas All-mode ref")


CHECKS = {
    "q_binom_sf": check_binom_sf,
    "q_spline_fit_eval": check_spline,
    "q_hic_significance_all": check_sig_all,
}


def main() -> None:
    from pfithic_spark.session import get_spark
    import __spark_entry__ as e

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app="pfithic-goldens")
    queries = e.queries()
    for key, check in CHECKS.items():
        print(f"{key}: running at {SF_DIR} ...")
        pdf = queries[key](spark, SF_DIR).toPandas()
        check(pdf)
        out = os.path.join(GOLDEN_DIR, f"{key}_sf001.parquet")
        pdf.to_parquet(out, index=False)
        print(f"  wrote {out} ({len(pdf)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
