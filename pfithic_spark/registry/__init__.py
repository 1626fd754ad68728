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
from .keys_r8 import *  # noqa: F401,F403,E402
from .keys_r8b import *  # noqa: F401,F403,E402
from .keys_r9 import *  # noqa: F401,F403,E402
from .keys_r10 import *  # noqa: F401,F403,E402
from .keys_r10b import *  # noqa: F401,F403,E402
from .keys_r11 import *  # noqa: F401,F403,E402
from .keys_r12 import *  # noqa: F401,F403,E402

_VERIFY_FIRST = [
    # Round-12 sweep (driver checks the first 50).  VERDICT r11 #1:
    # lead with the LAST 15 r5-era keys — after this round every
    # registered key's newest driver-oracle row is r6 or later, which
    # closes the full-registry freshness loop — then the 6 new
    # round-12 registrations (never driver-rowed, standing rule),
    # then the 29 alphabetically-first r6-era keys to keep the
    # rotation moving.
    # --- the r5-era freshness tail (VERDICT r11 #1 priority list) ---
    "q_heavy_hitters",
    "q_incremental_agg",
    "q_kr_balance",
    "q_lang_id",
    "q_mix_sources",
    "q_multimodal_features",
    "q_multimodal_frames",
    "q_multimodal_meta",
    "q_multimodal_resize",
    "q_ngram_coverage",
    "q_quantile_discretize",
    "q_referential_orphans",
    "q_triangle_count",
    "q_vector_norm_stats",
    "q_window_cume_dist",
    # --- round-12 registrations (never driver-rowed) ---
    "q_curation_incremental",
    "q_compaction_apply",
    "q_ivf_rebalance_apply",
    "q_drift_panel_streamed",
    "q_index_consistency",
    "q_sink_history",
    # --- oldest remaining rows (r6-era, alphabetical) ---
    "q_abc_classification",
    "q_anova_f",
    "q_assoc_rules",
    "q_benford",
    "q_cohort_ltv",
    "q_control_chart",
    "q_conversion_lag",
    "q_cramers_v",
    "q_cusum_changepoint",
    "q_dedup_lsh_cosine",
    "q_dedup_substring",
    "q_dow_profile",
    "q_edit_distance_dedup",
    "q_forecast_naive_eval",
    "q_gains_table",
    "q_hhi_concentration",
    "q_histogram_2d",
    "q_iqr_outliers",
    "q_pack_sequences",
    "q_pii_redact",
    "q_possible_pairs_frag",
    "q_repetition_filter",
    "q_rolling_corr",
    "q_runs_test",
    "q_sample_stratified",
    "q_seasonal_decompose",
    "q_session_paths",
    "q_sim_topk",
    "q_skew_metrics",
    # r6-era keys not fitting this 50-key window (round-13 backlog:
    # q_source_vocab_overlap, q_star_agg, plus):
    # q_dedup_substring..q_winsorized_stats remainder — the 19
    # alphabetically-last r6 rows (q_stream_* family, q_struct_funcs,
    # q_text_clean, q_text_stats, q_tfidf_terms, q_theil_sen_trend,
    # q_token_count, q_topk_movers, q_two_proportion_ztest,
    # q_unpivot, q_welch_ttest, q_window_range_frame,
    # q_winsorized_stats) rotate next.
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


# Every window entry must actually be registered — _reorder_first's
# `if k in d` otherwise silently DROPS a typo'd key and the driver
# sweeps one fewer than intended (ADVICE r10 #1).
_missing = [k for k in _VERIFY_FIRST if k not in QUERIES]
assert not _missing, f"_VERIFY_FIRST keys not registered: {_missing}"
assert len(_VERIFY_FIRST) == len(set(_VERIFY_FIRST)), "duplicate window keys"

QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
