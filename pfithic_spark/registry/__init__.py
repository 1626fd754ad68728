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

_VERIFY_FIRST = [
    # new in round-4 continuation session (§2.14)
    "q_bootstrap_ci",
    "q_graph_bfs",
    "q_rfm",
    "q_attribution",
    "q_interval_coalesce",
    "q_skyline",
    "q_pmi_bigrams",
    "q_heavy_hitters",
    "q_gaps_islands",
    "q_entropy",
    "q_pca",
    "q_sessionize",
    "q_time_weighted_avg",
    "q_chunk_documents",
    "q_bm25",
    "q_outlier_mad",
    "q_triangle_count",
    # new / code-changed in round 4
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_lm_score",
    "q_bpe_train",
    "q_bpe_tokenize",
    "q_join_bucketed",
    "q_join_bloom",
    "q_scd2_merge",
    "q_embedding_quantize",
    "q_sim_ivf",
    "q_join_skew_salted",
    # newest driver row is still round 1
    "q_math_funcs",
    "q_string_funcs",
    "q_date_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    "q_window_rank",
    "q_window_frame",
    "q_window_lead_lag",
    "q_window_ntile",
    "q_topk_per_group",
    "q_join_outer",
    "q_dedup_exact",
    # round-2 rows not re-swept in round 3 (oldest next)
    "q_scan_project",
    "q_project_derive",
    "q_filter_range",
    "q_filter_in",
    "q_canonicalize",
    "q_join_asof_tol",
    "q_agg_global",
    "q_agg_group",
    "q_agg_marginal",
    "q_agg_percentile",
    "q_unpivot",
    "q_window_range_frame",
    "q_corr_exact",
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_fingerprint",
    "q_tfidf_terms",
    "q_pii_redact",
    "q_sample_stratified",
    "q_contamination",
    "q_pack_sequences",
    "q_mix_sources",
    "q_repetition_filter",
    "q_ngram_coverage",
    "q_text_clean",
    "q_cap_per_group",
    "q_struct_funcs",
    "q_array_explode",
    "q_possible_pairs_frag",
    "q_dedup_ngram_global",
    "q_dedup_embedding",
    "q_sim_topk",
    "q_quality_score",
    "q_multimodal_meta",
    "q_multimodal_resize",
    "q_multimodal_frames",
    "q_multimodal_features",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_stateful",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_topk",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
