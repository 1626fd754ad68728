"""End-to-end golden test (SURVEY.md §5.2 layer 3): the Spark pipeline
must match the independent pandas dataflow on the derived fixture."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pandas_ref import run_significance_pandas


def _fixture_frames(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    from pfithic_spark.fixtures import BIASES_SQL, CONTACTS_SQL

    contacts = con.execute(CONTACTS_SQL).df()
    biases = con.execute(BIASES_SQL).df()
    con.close()
    return contacts, biases


@pytest.mark.parametrize("passes", [1, 2])
def test_pipeline_matches_pandas_ref(spark, sf_dir, passes):
    from pfithic_spark import fixtures as fx, hic

    contacts, biases = _fixture_frames(sf_dir)
    want = run_significance_pandas(
        contacts, biases, passes=passes
    ).sort_values(["chr1", "mid1", "chr2", "mid2"]).reset_index(drop=True)

    c = fx.fixture_contacts(spark, sf_dir)
    b = fx.fixture_biases(spark, sf_dir)
    chr_nbins = spark.createDataFrame(
        [(f"chr{i + 1}", fx.NBINS_GRID) for i in range(fx.N_CHROMS)],
        "chr string, nbins int",
    )
    cfg = hic.SigConfig(
        resolution=fx.RES,
        n_bins=fx.NBINS_OCC,
        passes=passes,
        dist_lo=0,
        dist_hi=2**40,
    )
    got = (
        hic.run_significance(spark, c, chr_nbins, biases=b, cfg=cfg)
        .toPandas()
        .sort_values(["chr1", "mid1", "chr2", "mid2"])
        .reset_index(drop=True)
    )

    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        want[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(got["bias1"], want["bias1"], rtol=1e-12)
    np.testing.assert_allclose(got["bias2"], want["bias2"], rtol=1e-12)
    np.testing.assert_allclose(
        got["p_value"], want["p_value"], rtol=1e-9, atol=1e-300
    )
    np.testing.assert_allclose(
        got["q_value"], want["q_value"], rtol=1e-9, atol=1e-300
    )


def test_spline_monotone(spark, sf_dir):
    import __spark_entry__ as e

    pdf = e.queries()["q_spline_fit_eval"](spark, sf_dir).toPandas()
    pdf = pdf.sort_values("d")
    assert (np.diff(pdf["spline_prob"]) <= 1e-15).all()


def test_kr_balance_rowsums(spark, sf_dir):
    """KR property: for BALANCED loci (bias > 0), diag(x)·A·diag(x)
    restricted to balanced loci has constant row sums per chromosome;
    unbalanceable loci carry the reference -1 sentinel [SC-2].  The
    sf0.001 fixture matrix is tree-fragmented (no positive balance
    exists at any coverage filter — verified in round 3), so the whole
    vector degrades to the sentinel there; sf0.01 balances with zero
    drops, asserted tight below."""
    import numpy as np

    from pfithic_spark import fixtures as fx, hic

    gate_sf = "/root/testdata/sf0.01"
    c = fx.fixture_contacts(spark, gate_sf)
    bdf = hic.kr_biases(c, fx.RES).toPandas()
    assert set(bdf["chr"]) == {f"chr{i + 1}" for i in range(fx.N_CHROMS)}
    # every bias is the -1 sentinel or strictly positive — never 0/NaN
    assert ((bdf["bias"] > 0) | (bdf["bias"] == -1.0)).all()
    scale = {(r.chr, r.mid): r.bias for r in bdf.itertuples(index=False)}
    pdf = c.toPandas()
    sums: dict[tuple[str, int], float] = {}
    for r in pdf.itertuples(index=False):
        b1 = scale[(r.chr1, r.mid1)]
        b2 = scale[(r.chr2, r.mid2)]
        if b1 < 0 or b2 < 0:
            continue
        w = r.contact_count * b1 * b2
        sums[(r.chr1, r.mid1)] = sums.get((r.chr1, r.mid1), 0.0) + w
        if (r.chr2, r.mid2) != (r.chr1, r.mid1):
            sums[(r.chr2, r.mid2)] = sums.get((r.chr2, r.mid2), 0.0) + w
    for chrom in (f"chr{i + 1}" for i in range(fx.N_CHROMS)):
        kept = bdf[(bdf["chr"] == chrom) & (bdf["bias"] > 0)]
        # sf0.01 balances with no drops; mean-1 normalization over kept
        assert len(kept) > 0 and (kept["bias"] > 0).all()
        assert abs(kept["bias"].mean() - 1.0) < 1e-9
        vals = np.array([v for (ch, _), v in sums.items() if ch == chrom])
        assert vals.std() / vals.mean() < 1e-4, chrom


def test_kr_balance_unbalanceable_sentinel(spark):
    """A structurally unbalanceable matrix (3-node path: the middle row
    sum is forced to 2) must trigger the sparsity retry — drop the
    sparsest locus, balance the remaining edge — and mark the dropped
    locus with the -1 sentinel.  Never a signed pseudo-balance with
    negative or zero biases."""
    from pfithic_spark import hic

    c = spark.createDataFrame(
        [("chrX", 2500, "chrX", 7500, 4), ("chrX", 7500, "chrX", 12500, 2)],
        "chr1 string, mid1 long, chr2 string, mid2 long, contact_count long",
    )
    bdf = hic.kr_biases(c, 5000).toPandas().set_index("mid")
    assert len(bdf) == 3
    # the sparsest locus (12500, coverage 2) is dropped; the surviving
    # edge (2500)-(7500) balances: x1·4·x2 = const row sums
    assert bdf.loc[12500, "bias"] == -1.0
    kept = bdf.loc[[2500, 7500], "bias"]
    assert (kept > 0).all()
    assert abs(kept.mean() - 1.0) < 1e-9



@pytest.mark.parametrize("passes", [1, 2])
def test_adversarial_canonicalization_bias_bounds_ties(spark, passes):
    """SC-2/SC-6 edge semantics, pinned against the independent pandas
    dataflow: (a) uncanonicalized + duplicated input pairs collapse into
    summed canonical rows; (b) biases exactly AT the 0.5/2.0 validity
    bounds are valid while values epsilon outside are sentinels;
    (c) massed p-value ties resolve through the deterministic BH
    tiebreak chain — across chromosomes and passes."""
    from pfithic_spark import hic

    rng = np.random.default_rng(5)
    nb = 30
    rows = []
    for chrom in ("chr1", "chr2"):
        for _ in range(300):
            i, j = rng.integers(0, nb, 2)
            if i == j:
                continue
            # deliberately UNORDERED endpoints; cc from a tiny value set
            # so many pairs tie on (dist, cc) → tied p-values
            rows.append(
                (
                    chrom,
                    int(i * 5000 + 2500),
                    chrom,
                    int(j * 5000 + 2500),
                    int(1 + (i + j) % 3),
                )
            )
    # explicit duplicates of one pair, in both endpoint orders
    rows += [
        ("chr1", 12500, "chr1", 2500, 3),
        ("chr1", 2500, "chr1", 12500, 2),
    ] * 2
    contacts = spark.createDataFrame(
        rows, "chr1 string, mid1 long, chr2 string, mid2 long, contact_count long"
    )
    # biases cycling through: exactly-at-bounds (valid), epsilon-outside
    # (sentinel), neutral
    bias_vals = [0.5, 2.0, 0.5 - 1e-9, 2.0 + 1e-9, 1.25]
    bias_rows = [
        (chrom, k * 5000 + 2500, bias_vals[k % 5])
        for chrom in ("chr1", "chr2")
        for k in range(nb)
    ]
    biases = spark.createDataFrame(bias_rows, "chr string, mid long, bias double")

    cfg = hic.SigConfig(
        resolution=5000, n_bins=10, passes=passes, dist_lo=0, dist_hi=2**40
    )
    got = (
        hic.run_significance(
            spark, contacts, [("chr1", nb), ("chr2", nb)], biases=biases, cfg=cfg
        )
        .toPandas()
        .sort_values(["chr1", "mid1", "chr2", "mid2"])
        .reset_index(drop=True)
    )

    # independent canonicalization: order endpoints, sum duplicates
    pdf = pd.DataFrame(
        rows, columns=["chr1", "mid1", "chr2", "mid2", "contact_count"]
    )
    swap = (pdf["chr1"] > pdf["chr2"]) | (
        (pdf["chr1"] == pdf["chr2"]) & (pdf["mid1"] > pdf["mid2"])
    )
    for a, b in (("chr1", "chr2"), ("mid1", "mid2")):
        pdf.loc[swap, [a, b]] = pdf.loc[swap, [b, a]].to_numpy()
    cpd = pdf.groupby(
        ["chr1", "mid1", "chr2", "mid2"], as_index=False
    )["contact_count"].sum()
    want = (
        run_significance_pandas(
            cpd,
            pd.DataFrame(bias_rows, columns=["chr", "mid", "bias"]),
            nbins_grid=nb,
            res=5000,
            n_bins=10,
            passes=passes,
            n_chroms=2,
        )
        .sort_values(["chr1", "mid1", "chr2", "mid2"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        want[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        check_dtype=False,
    )
    # the duplicated pair collapsed and summed both orders
    dup = got[(got["chr1"] == "chr1") & (got["mid1"] == 2500) & (got["mid2"] == 12500)]
    assert len(dup) == 1
    np.testing.assert_allclose(got["bias1"], want["bias1"], rtol=1e-12)
    np.testing.assert_allclose(got["bias2"], want["bias2"], rtol=1e-12)
    np.testing.assert_allclose(
        got["p_value"], want["p_value"], rtol=1e-9, atol=1e-300
    )
    np.testing.assert_allclose(
        got["q_value"], want["q_value"], rtol=1e-9, atol=1e-300
    )


def test_fragment_mode_matches_pandas_ref(spark):
    """res=0 (variable restriction fragments): the pipeline censuses
    possible pairs from the ACTUAL irregular fragment midpoints, and the
    full significance output matches the independent pandas dataflow
    computing the same census by brute force."""
    from pfithic_spark import hic

    rng = np.random.default_rng(11)
    frag_rows = []
    for chrom, n in (("chr1", 60), ("chr2", 40)):
        mids = np.cumsum(rng.integers(2000, 9000, n)) + 1000
        frag_rows += [(chrom, int(m)) for m in mids]
    frags_pd = pd.DataFrame(frag_rows, columns=["chr", "mid"])

    rows = []
    for chrom, n in (("chr1", 60), ("chr2", 40)):
        mids = frags_pd.loc[frags_pd["chr"] == chrom, "mid"].to_numpy()
        for _ in range(500):
            i, j = sorted(rng.integers(0, n, 2))
            if i == j:
                continue
            rows.append(
                (
                    chrom,
                    int(mids[i]),
                    chrom,
                    int(mids[j]),
                    int(rng.integers(1, 6)),
                )
            )
    contacts = spark.createDataFrame(
        rows, "chr1 string, mid1 long, chr2 string, mid2 long, contact_count long"
    )
    frags = spark.createDataFrame(frags_pd)
    cfg = hic.SigConfig(
        resolution=0, n_bins=20, passes=1, dist_lo=0, dist_hi=2**40
    )
    got = (
        hic.run_significance(spark, contacts, biases=None, cfg=cfg, fragments=frags)
        .toPandas()
        .sort_values(["chr1", "mid1", "chr2", "mid2"])
        .reset_index(drop=True)
    )

    # pandas census: brute-force per-chromosome pair distances
    poss: dict[int, int] = {}
    for _, grp in frags_pd.groupby("chr"):
        m = np.sort(grp["mid"].to_numpy(dtype=np.int64))
        d = (m[None, :] - m[:, None]).ravel()
        d = d[d > 0]
        for dist, cnt in zip(*np.unique(d, return_counts=True)):
            poss[int(dist)] = poss.get(int(dist), 0) + int(cnt)
    possible = pd.Series(poss).sort_index()

    cpd = (
        pd.DataFrame(
            rows, columns=["chr1", "mid1", "chr2", "mid2", "contact_count"]
        )
        .groupby(["chr1", "mid1", "chr2", "mid2"], as_index=False)[
            "contact_count"
        ]
        .sum()
    )
    want = (
        run_significance_pandas(
            cpd, None, n_bins=20, passes=1, possible_override=possible
        )
        .sort_values(["chr1", "mid1", "chr2", "mid2"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        want[["chr1", "mid1", "chr2", "mid2", "contact_count"]],
        check_dtype=False,
    )
    np.testing.assert_allclose(
        got["p_value"], want["p_value"], rtol=1e-9, atol=1e-300
    )
    np.testing.assert_allclose(
        got["q_value"], want["q_value"], rtol=1e-9, atol=1e-300
    )


def test_inter_chromosomal_mode(spark):
    """SC-5: 'All' mode scores inter contacts with the flat interChrProb
    null; q-values well-formed; row count = intra + inter."""
    import numpy as np

    from pfithic_spark import hic

    rng = np.random.default_rng(7)
    rows = []
    for chrom, nb in (("chr1", 40), ("chr2", 30)):
        for _ in range(300):
            i, j = sorted(rng.integers(0, nb, 2))
            if i == j:
                continue
            rows.append(
                (chrom, int(i * 5000 + 2500), chrom, int(j * 5000 + 2500), int(rng.integers(1, 8)))
            )
    for _ in range(60):  # inter pairs
        i = int(rng.integers(0, 40)) * 5000 + 2500
        j = int(rng.integers(0, 30)) * 5000 + 2500
        rows.append(("chr1", i, "chr2", j, int(rng.integers(1, 3))))
    contacts = spark.createDataFrame(
        rows, "chr1 string, mid1 long, chr2 string, mid2 long, contact_count long"
    )
    chr_nbins = spark.createDataFrame(
        [("chr1", 40), ("chr2", 30)], "chr string, nbins int"
    )
    cfg = hic.SigConfig(n_bins=20, contact_type="All", dist_lo=0, dist_hi=2**40)
    out = hic.run_significance(spark, contacts, chr_nbins, cfg=cfg).toPandas()
    # canonicalized distinct pairs, intra + inter all present
    n_intra = out[out["chr1"] == out["chr2"]].shape[0]
    n_inter = out[out["chr1"] != out["chr2"]].shape[0]
    assert n_intra > 0 and n_inter > 0
    assert ((out["p_value"] >= 0) & (out["p_value"] <= 1)).all()
    assert ((out["q_value"] >= 0) & (out["q_value"] <= 1)).all()
    # inter contacts with identical (cc, biases) get identical p (flat null)
    inter = out[out["chr1"] != out["chr2"]]
    one = inter[inter["contact_count"] == 1]
    if len(one) > 1:
        assert one["p_value"].nunique() == 1


def test_run_significance_empty_input(spark):
    """An empty contacts slice (e.g. a chromosome allow-list matching
    nothing) must complete with empty output, not crash the pipeline —
    at 100 TB one empty slice is routine."""
    from pfithic_spark import hic
    from pfithic_spark.io import CONTACTS_SCHEMA

    empty = spark.createDataFrame([], CONTACTS_SCHEMA)
    for passes in (1, 2):
        out = hic.run_significance(
            spark,
            empty,
            chr_nbins=[("chr1", 10)],
            cfg=hic.SigConfig(n_bins=5, passes=passes),
        )
        assert out.collect() == []
        assert {"p_value", "q_value"} <= set(out.columns)
    # res=0 fragment-census path through fit_null_curve_distributed
    frags = spark.createDataFrame([], "chr string, mid long")
    out = hic.run_significance(
        spark,
        empty,
        fragments=frags,
        cfg=hic.SigConfig(resolution=0, n_bins=5, dist_hi=10**6),
    )
    assert out.collect() == []


def test_all_mode_matches_pandas_ref(spark, sf_dir):
    """'All' mode end-to-end vs the independent pandas dataflow: intra
    scored on the fitted null, inter on the flat interChrProb null,
    one combined BH with M = possibleIntra + possibleInter.  This is
    the generation-time gate behind tests/golden/q_hic_significance_all
    (tools/make_goldens.py runs the same comparison)."""
    from pandas_ref import run_significance_all_pandas

    from pfithic_spark import fixtures as fx, hic

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    intra_pd = con.execute(fx.CONTACTS_SQL).df()
    inter_pd = con.execute(fx.INTER_CONTACTS_SQL).df()
    biases_pd = con.execute(fx.BIASES_SQL).df()
    con.close()
    want = (
        run_significance_all_pandas(intra_pd, inter_pd, biases_pd)
        .sort_values(["chr1", "chr2", "mid1", "mid2"])
        .reset_index(drop=True)
    )

    c = fx.fixture_contacts(spark, sf_dir).unionByName(
        fx.fixture_inter_contacts(spark, sf_dir)
    )
    cfg = hic.SigConfig(
        resolution=fx.RES,
        n_bins=fx.NBINS_OCC,
        passes=1,
        dist_lo=0,
        dist_hi=2**40,
        contact_type="All",
    )
    got = (
        hic.run_significance(
            spark,
            c,
            [(f"chr{i + 1}", fx.NBINS_GRID) for i in range(fx.N_CHROMS)],
            biases=fx.fixture_biases(spark, sf_dir),
            cfg=cfg,
        )
        .toPandas()
        .sort_values(["chr1", "chr2", "mid1", "mid2"])
        .reset_index(drop=True)
    )
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
