"""Deterministic in-query fixture derivations shared with the DuckDB
oracle (FIXTURES.md §3).

The driver's oracle sees only the ten fixture views, so Hi-C-shaped
query keys derive a contacts/biases table *inside the query* with pure
integer arithmetic that evaluates identically in Spark SQL and DuckDB.
The SQL text constants here are embedded verbatim in both dialects so
the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import load_table

#: fixed-resolution grid (SURVEY.md §1.1): mid = k*RES + RES/2
RES = 5000
#: number of grid bins per chromosome in the derived fixture
NBINS_GRID = 500
#: equal-occupancy bin count for the binning queries (fithic -b default 100)
NBINS_OCC = 100

#: number of chromosomes in the derived fixture.  TWO, deliberately:
#: every grid midpoint exists on both chromosomes, so any join that
#: drops the chromosome from its key (the round-1 attach_biases bug)
#: duplicates rows / attaches wrong-chromosome values and fails the
#: oracle instead of hiding behind a single-chromosome fixture.
N_CHROMS = 2

#: chromosome assignment expression shared by contacts and biases —
#: valid verbatim in both Spark SQL and DuckDB.
_CHR_SQL = "CASE WHEN user_id % 2 = 0 THEN 'chr1' ELSE 'chr2' END"

#: Canonicalized, duplicate-summed contacts derived from `events`.
#: Valid in both Spark SQL and DuckDB verbatim. (chr1,mid1) <= (chr2,mid2)
#: by construction of the WHERE clause (intra-chromosomal rows only);
#: duplicates pre-summed [SC-6].  Two chromosomes share the same grid.
CONTACTS_SQL = f"""
SELECT chr1, mid1, chr2, mid2,
       CAST(SUM(contact_count) AS BIGINT) AS contact_count
FROM (
    SELECT {_CHR_SQL} AS chr1,
           CAST((event_id % 500) * 5000 + 2500 AS BIGINT) AS mid1,
           {_CHR_SQL} AS chr2,
           CAST(((event_id * 7 + user_id) % 500) * 5000 + 2500 AS BIGINT) AS mid2,
           CAST(1 + (event_id % 5) AS BIGINT) AS contact_count
    FROM events
    WHERE (event_id % 500) < ((event_id * 7 + user_id) % 500)
) raw
GROUP BY chr1, mid1, chr2, mid2
""".strip()

#: Per-(chr, mid) bias factors on the same grid; ~90% coverage per
#: chromosome (k%10<>0 rows absent, exercising the left-join default)
#: and values 0.3..2.7 so some fall outside the [0.5, 2] validity window
#: (sentinel path, SC-2).  chr2's values are phase-shifted so a
#: wrong-chromosome join attaches visibly different biases.
BIASES_SQL = f"""
SELECT chr,
       CAST(k * 5000 + 2500 AS BIGINT) AS mid,
       CAST(0.3 + ((k + CASE WHEN chr = 'chr2' THEN 4 ELSE 0 END) % 9) * 0.3 AS DOUBLE) AS bias
FROM (
  SELECT DISTINCT {_CHR_SQL} AS chr, event_id % 500 AS k FROM events
) ks
WHERE k % 10 <> 0
""".strip()


#: Inter-chromosomal contacts (chr1 × chr2) — canonical by construction
#: (chr1 < chr2), duplicates pre-summed; exercises the flat
#: interChrProb scoring path [SC-5].
INTER_CONTACTS_SQL = """
SELECT chr1, mid1, chr2, mid2,
       CAST(SUM(contact_count) AS BIGINT) AS contact_count
FROM (
    SELECT 'chr1' AS chr1,
           CAST((event_id % 500) * 5000 + 2500 AS BIGINT) AS mid1,
           'chr2' AS chr2,
           CAST(((event_id * 11 + user_id) % 500) * 5000 + 2500 AS BIGINT) AS mid2,
           CAST(1 + (event_id % 4) AS BIGINT) AS contact_count
    FROM events
) raw
GROUP BY chr1, mid1, chr2, mid2
""".strip()


#: Variable restriction-fragment midpoints (res=0 mode) on two
#: chromosomes: strictly increasing irregular positions (step 4000 plus
#: a k²-mod jitter < 3000, so spacing varies but never collides) —
#: exercises the fragment-census path where no fixed grid exists.
FRAGS_SQL = f"""
SELECT chr,
       CAST(k * 4000 + (k * k % 997) * 3 AS BIGINT) AS mid
FROM (
  SELECT DISTINCT {_CHR_SQL} AS chr, event_id % 300 AS k FROM events
) ks
""".strip()


#: namespaced view so the engine never clobbers a host session's views
_EVENTS_VIEW = "pfithic_spark_events_src"


def _with_events_view(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "events").createOrReplaceTempView(_EVENTS_VIEW)


def fixture_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contacts DataFrame from the shared SQL (identical to the oracle CTE)."""
    _with_events_view(spark, sf_dir)
    return spark.sql(CONTACTS_SQL.replace("FROM events", f"FROM {_EVENTS_VIEW}"))


def fixture_biases(spark: SparkSession, sf_dir: str) -> DataFrame:
    _with_events_view(spark, sf_dir)
    return spark.sql(BIASES_SQL.replace("FROM events", f"FROM {_EVENTS_VIEW}"))


def fixture_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    _with_events_view(spark, sf_dir)
    return spark.sql(FRAGS_SQL.replace("FROM events", f"FROM {_EVENTS_VIEW}"))


def fixture_inter_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _with_events_view(spark, sf_dir)
    return spark.sql(
        INTER_CONTACTS_SQL.replace("FROM events", f"FROM {_EVENTS_VIEW}")
    )


def contacts_cte(alias: str = "contacts") -> str:
    """`WITH <alias> AS (...)` fragment for oracle SQL strings."""
    return f"{alias} AS (\n{CONTACTS_SQL}\n)"


def biases_cte(alias: str = "biases") -> str:
    return f"{alias} AS (\n{BIASES_SQL}\n)"


def frags_cte(alias: str = "frags") -> str:
    return f"{alias} AS (\n{FRAGS_SQL}\n)"


def inter_cte(alias: str = "inter") -> str:
    return f"{alias} AS (\n{INTER_CONTACTS_SQL}\n)"
