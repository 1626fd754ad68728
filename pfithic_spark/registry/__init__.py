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

_VERIFY_FIRST = [
    # Round-9 sweep (driver checks the first 50).  VERDICT r8 #1:
    # the 38 round-8 keys (§2.20 keys_r8.py + §2.21 keys_r8b.py,
    # zero driver rows ever) followed by the 12 remaining r4-era
    # keys whose newest driver row predates r5.  38 + 12 fills the
    # 50-key window exactly, and re-rows q_bm25/q_lm_score (and via
    # the r8 window q_pmi_bigrams already rotated) on their round-8
    # re-planned single-corpus-pass plans.
    # §2.20 (keys_r8.py)
    "q_theil_index",
    "q_hodges_lehmann",
    "q_isotonic_trend",
    "q_kruskal_wallis",
    "q_weighted_sample",
    "q_negative_sampling",
    "q_tdigest_quantiles",
    "q_huber_regression",
    "q_partial_autocorr",
    "q_markov_attribution",
    "q_pq_codes",
    "q_brown_forsythe",
    # §2.21 (keys_r8b.py)
    "q_target_encoding",
    "q_mcnemar",
    "q_split_information_gain",
    "q_feature_hash",
    "q_calibration_bins",
    "q_roc_auc",
    "q_token_chi2",
    "q_cross_correlation",
    "q_hll_sketch",
    "q_countmin_sketch",
    "q_ndcg",
    "q_silhouette_score",
    "q_cochran_armitage",
    "q_cliffs_delta",
    "q_ab_srm",
    "q_granger_lag1",
    "q_fisher_exact",
    "q_knn_classify",
    "q_readability",
    "q_intersect_all",
    "q_except_all",
    "q_record_linkage",
    "q_weighted_quantile",
    "q_quantile_normalize",
    "q_changepoint_binary",
    "q_oov_rate",
    # r4-era backlog — the 12 keys whose newest driver row is still r4
    "q_chunk_documents",
    "q_bm25",
    "q_outlier_mad",
    "q_merge_upsert",
    "q_snapshot_diff",
    "q_lm_score",
    "q_bpe_train",
    "q_bpe_tokenize",
    "q_join_bucketed",
    "q_join_bloom",
    "q_scd2_merge",
    "q_embedding_quantize",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
