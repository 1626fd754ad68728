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

_VERIFY_FIRST = [
    # Round-8 sweep (driver checks the first 50).  VERDICT r7 #1:
    # the 18 §2.19 keys (registered in round 7, zero driver rows
    # ever) followed by the 32 oldest r4-era keys (newest driver row
    # = r4; first 32 of the 44 in registry insertion order — the
    # remaining 12 rotate in round 9).  18 + 32 fills the 50-key
    # window exactly.
    "q_kendall_tau",
    "q_spearman_corr",
    "q_mann_kendall",
    "q_mutual_information",
    "q_dedup_containment",
    "q_open_order_backlog",
    "q_price_volume_mix",
    "q_growth_accounting",
    "q_js_divergence",
    "q_psi_drift",
    "q_stratified_kfold",
    "q_embedding_outliers",
    "q_survival_curve",
    "q_order_cycle_time",
    "q_adamic_adar",
    "q_benjamini_yekutieli",
    "q_ljung_box",
    "q_cohens_d",
    # r4-era backlog — oldest remaining driver rows (32 of 44)
    "q_filter_range",
    "q_agg_group",
    "q_agg_global",
    "q_agg_marginal",
    "q_filter_in",
    "q_window_ntile",
    "q_join_outer",
    "q_window_rank",
    "q_window_frame",
    "q_window_lead_lag",
    "q_topk_per_group",
    "q_math_funcs",
    "q_string_funcs",
    "q_date_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    "q_dedup_exact",
    "q_join_asof_tol",
    "q_sim_ivf",
    "q_canonicalize",
    "q_join_skew_salted",
    "q_bootstrap_ci",
    "q_rfm",
    "q_attribution",
    "q_interval_coalesce",
    "q_pmi_bigrams",
    "q_gaps_islands",
    "q_entropy",
    "q_pca",
    "q_sessionize",
    "q_time_weighted_avg",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
