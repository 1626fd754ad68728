"""Round-6 key semantics the fixture-scale parity gate can't reach:
the edit-distance hot-block cap actually FIRING (fixture blocks top
out at 17 rows), and substring-span dedup on a planted-span corpus
with closed-form expectations — both cross-checked against the
registered DuckDB oracle on the same synthetic table, proving the
oracle encodes the identical cap/span semantics."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

import __spark_entry__ as e
from tests.oracle_harness import compare


def _write_docs(spark, rows, path):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )


def _docs_con(path):
    con = duckdb.connect()
    # Spark writes a part-file DIRECTORY; DuckDB wants a glob
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{path}/documents.parquet/*.parquet'"
    )
    return con


def test_edit_distance_cap_drops_hot_block(spark, tmp_path):
    from pfithic_spark.registry.keys_r5 import EDIT_DEDUP_MAX_BLOCK

    hot_n = EDIT_DEDUP_MAX_BLOCK + 50
    rows = [
        # hot block: all share prefix 'http', identical 32-char prefix
        (i, f"http boilerplate terms of service {i}", "en", "web", 40)
        for i in range(hot_n)
    ] + [
        # two planted pairs in small private blocks, lev 1 apart
        (100_000, "aaaa tail one m0 filler words xx", "en", "web", 32),
        (100_001, "aaaa tail one m1 filler words xx", "en", "web", 32),
        (100_002, "bbbb tail two m0 filler words xx", "en", "web", 32),
        (100_003, "bbbb tail two m1 filler words xx", "en", "web", 32),
    ]
    _write_docs(spark, rows, str(tmp_path))
    got = sorted(
        (r["id1"], r["id2"], r["dist"])
        for r in e.queries()["q_edit_distance_dedup"](
            spark, str(tmp_path)
        ).collect()
    )
    # the >cap hot block contributes NOTHING; the planted pairs survive
    assert got == [
        (100_000, 100_001, 1),
        (100_002, 100_003, 1),
    ], got
    # and the DuckDB oracle applies the IDENTICAL cap on the same data
    compare(
        e.queries()["q_edit_distance_dedup"](spark, str(tmp_path)),
        _docs_con(str(tmp_path)),
        e.oracle_sql()["q_edit_distance_dedup"],
        "q_edit_distance_dedup[hot-block]",
    )


def test_dedup_substring_planted_spans(spark, tmp_path):
    # docs 0 and 1 share a 10-token span at positions 20-29; every doc
    # carries the same 8-token boilerplate at 40-47; all other tokens
    # are globally unique.  Closed form: docs 0/1 -> 18 dup tokens in
    # 2 spans; docs 2..9 -> 8 in 1.
    def text(doc):
        toks = []
        for j in range(50):
            if 40 <= j <= 47:
                toks.append(f"b{j}")
            elif doc < 2 and 20 <= j <= 29:
                toks.append(f"s_{j}")
            else:
                toks.append(f"t{doc}x{j}")
        return " ".join(toks)

    rows = [(d, text(d), "en", "web", 0) for d in range(10)]
    _write_docs(spark, rows, str(tmp_path))
    q = e.queries()["q_dedup_substring"](spark, str(tmp_path))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
        for r in q.collect()
    }
    for d in range(10):
        want = (50, 18, 2) if d < 2 else (50, 8, 1)
        assert got[d] == want, (d, got[d], want)
    compare(
        e.queries()["q_dedup_substring"](spark, str(tmp_path)),
        _docs_con(str(tmp_path)),
        e.oracle_sql()["q_dedup_substring"],
        "q_dedup_substring[planted]",
    )


def test_dedup_substring_short_and_nodup_docs(spark, tmp_path):
    # a doc with < K tokens produces no grams; a doc with no repeated
    # grams reports zeros; both stay in the output via the left join
    rows = [
        (0, "only three tokens", "en", "web", 0),
        (1, " ".join(f"u{j}" for j in range(12)), "en", "web", 0),
        # two docs sharing ALL 12 tokens -> one maximal span of 12
        (2, " ".join(f"v{j}" for j in range(12)), "en", "web", 0),
        (3, " ".join(f"v{j}" for j in range(12)), "en", "web", 0),
    ]
    _write_docs(spark, rows, str(tmp_path))
    q = e.queries()["q_dedup_substring"](spark, str(tmp_path))
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["n_spans"])
        for r in q.collect()
    }
    assert got[0] == (3, 0, 0), got[0]
    assert got[1] == (12, 0, 0), got[1]
    assert got[2] == (12, 12, 1) and got[3] == (12, 12, 1), got
    compare(
        e.queries()["q_dedup_substring"](spark, str(tmp_path)),
        _docs_con(str(tmp_path)),
        e.oracle_sql()["q_dedup_substring"],
        "q_dedup_substring[edge]",
    )


def test_assoc_rules_basket_cap_fires(spark, tmp_path):
    """Fixture baskets top out at 13 items, so parity can't prove the
    basket cap: plant a 70-item mega-basket plus two normal baskets
    sharing a pair — the mega-basket must contribute NOTHING (its
    C(70,2) pairs are dropped, and its items don't inflate margins),
    while the planted pair survives with support 2 over the 2
    surviving baskets."""
    from pfithic_spark.registry.keys_r6 import ASSOC_MAX_BASKET

    rows = (
        # mega-basket: order 1, 70 distinct parts (> cap of 64)
        [(1, p) for p in range(1000, 1000 + ASSOC_MAX_BASKET + 6)]
        # two normal baskets both containing parts (7, 8)
        + [(2, 7), (2, 8), (2, 9), (3, 7), (3, 8)]
    )
    spark.createDataFrame(
        [
            (ok, pk, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",)
            for ok, pk in rows
        ],
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string",
    ).withColumn("l_suppkey", F.lit(1).cast("long")).withColumn(
        "l_shipdate", F.lit("1995-01-01").cast("timestamp")
    ).coalesce(2).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    got = {
        (r["pa"], r["pb"]): (r["support"], r["n_baskets"])
        for r in e.queries()["q_assoc_rules"](
            spark, str(tmp_path)
        ).collect()
    }
    # only the planted (7, 8) pair has support >= 2; n_baskets counts
    # the 2 SURVIVING baskets (the mega-basket is excluded everywhere)
    assert got == {(7, 8): (2, 2)}, got
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS "
        f"SELECT * FROM '{tmp_path}/lineitem.parquet/*.parquet'"
    )
    compare(
        e.queries()["q_assoc_rules"](spark, str(tmp_path)),
        con,
        e.oracle_sql()["q_assoc_rules"],
        "q_assoc_rules[basket-cap]",
    )
