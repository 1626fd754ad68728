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

_VERIFY_FIRST = [
    # r02-era driver rows — the LAST pre-r3 backlog (VERDICT r5 #1);
    # all 20 fit in one 50-key sweep
    "q_pack_sequences",
    "q_pii_redact",
    "q_possible_pairs_frag",
    "q_repetition_filter",
    "q_sample_stratified",
    "q_sim_topk",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_stateful",
    "q_stream_topk",
    "q_stream_tumbling",
    "q_struct_funcs",
    "q_text_clean",
    "q_text_stats",
    "q_tfidf_terms",
    "q_token_count",
    "q_unpivot",
    "q_window_range_frame",
    # new in round 6 (§2.16) — no driver row yet
    "q_dedup_substring",
    "q_welch_ttest",
    "q_benford",
    "q_iqr_outliers",
    "q_dow_profile",
    "q_source_vocab_overlap",
    # §2.17 warehouse-analytics breadth — new in round 6
    "q_star_agg",
    "q_hhi_concentration",
    "q_cramers_v",
    "q_anova_f",
    "q_assoc_rules",
    "q_cusum_changepoint",
    "q_rolling_corr",
    "q_seasonal_decompose",
    "q_conversion_lag",
    "q_gains_table",
    "q_dedup_lsh_cosine",
    "q_control_chart",
    "q_topk_movers",
    "q_forecast_naive_eval",
    "q_two_proportion_ztest",
    "q_histogram_2d",
    # §2.18 lifecycle / robust-stats breadth — new in round 6
    "q_cohort_ltv",
    "q_theil_sen_trend",
    "q_abc_classification",
    "q_runs_test",
    "q_winsorized_stats",
    "q_session_paths",
    # code changed in round 6 (hot-block cap; action fold)
    "q_edit_distance_dedup",
    "q_skew_metrics",
    # --- 50-key sweep boundary (driver checks the first 50) ---
    # Late-round-6 code changes NOT fitting this round's sweep: the
    # two-phase helper redesign (value-deterministic buckets) touched
    # these keys' plans, and q_skyline's rejoin was rewritten.  All
    # re-verified this round by the 192-key vanilla replica + parity
    # suite; put them first in round 7's rotation for driver rows.
    "q_skyline",
    "q_window_running",
    # r03-era backlog (oldest remaining after this sweep)
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
    "q_window_running",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
