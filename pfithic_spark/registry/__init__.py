"""queries() / oracle_sql() registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle SQL string over the fixture views.  Column names/aliases
MUST match between the two sides; floats follow the determinism rules in
FIXTURES.md §4 (exact decimal sums, integer math where possible,
round(9) after final float ops, full tie-breakers on every rank/limit).
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401

from ._core import (  # noqa: F401
    DIST_HI,
    DIST_LO,
    GOLDEN_ORACLE_KEYS,
    ORACLE_SQL,
    QUERIES,
    _GOLDEN_DIR,
    _golden_oracle,
    register,
)

# Importing each family module REGISTERS its keys into _core.QUERIES /
# _core.ORACLE_SQL; the import order below replicates the flat file's
# section order exactly, so registry insertion order is unchanged.
from .keys_basic import *  # noqa: F401,F403,E402
from .keys_joins import *  # noqa: F401,F403,E402
from .keys_agg_window import *  # noqa: F401,F403,E402
from .keys_hic import *  # noqa: F401,F403,E402
from .keys_funcs import *  # noqa: F401,F403,E402
from .keys_llm import *  # noqa: F401,F403,E402
from .keys_stream import *  # noqa: F401,F403,E402
from .keys_round3 import *  # noqa: F401,F403,E402
from .keys_lakehouse import *  # noqa: F401,F403,E402
from .keys_ext import *  # noqa: F401,F403,E402
from .keys_r5 import *  # noqa: F401,F403,E402
from .keys_r6 import *  # noqa: F401,F403,E402
from .keys_r6b import *  # noqa: F401,F403,E402
from .keys_r7 import *  # noqa: F401,F403,E402

_VERIFY_FIRST = [
    # Round-7 sweep (driver checks the first 50).  VERDICT r6 #2:
    # lead with the two keys whose plans the late-r6 windows.py
    # redesign / rejoin rewrite touched, then the 46-key r3-era
    # backlog (oldest remaining driver rows).  48 keys; the driver's
    # 50-key window picks up the next two insertion-order keys as
    # spares.  Previous duplicate q_window_running entry dropped.
    "q_skyline",
    "q_window_running",
    # r03-era backlog — oldest remaining driver rows
    "q_agg_approx",
    "q_agg_approx_quantile",
    "q_agg_bin",
    "q_agg_collect",
    "q_agg_distinct",
    "q_agg_mode",
    "q_anomaly_zscore",
    "q_bh_fdr",
    "q_binom_sf",
    "q_contact_prior",
    "q_contact_prior_inter",
    "q_cube",
    "q_curation_pipeline",
    "q_dedup_clusters",
    "q_dedup_near",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_equal_occupancy_binning",
    "q_except",
    "q_filter_mappability",
    "q_funnel_steps",
    "q_grouping_sets",
    "q_hic_significance",
    "q_hic_significance_all",
    "q_histogram",
    "q_intersect",
    "q_join_anti",
    "q_join_asof",
    "q_join_bias",
    "q_join_broadcast",
    "q_join_interval_overlap",
    "q_join_range",
    "q_join_semi",
    "q_join_shuffle",
    "q_pagerank",
    "q_pivot",
    "q_possible_pairs",
    "q_profile_columns",
    "q_quality_score",
    "q_resample_fill",
    "q_retention_cohorts",
    "q_rollup",
    "q_shuffle_shards",
    "q_sort_limit",
    "q_spline_fit_eval",
    "q_union",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
