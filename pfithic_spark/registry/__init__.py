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

_VERIFY_FIRST = [
    # Round-10 sweep (driver checks the first 50).  VERDICT r9 #2
    # prescribed 26 §2.22 keys + the two re-fixed reds + 22 oldest
    # r5-era keys; the 13 §2.23 keys added THIS round (keys_r10.py)
    # outrank 13 of the r5-era re-rows by the rotation's standing
    # precedence rule (never-driver-rowed keys first — the r5-era
    # keys all hold an r5-green row), so the window is 26 + 2 + 13
    # §2.23 + 9 oldest r5-era = 50.
    # §2.22 (keys_r9.py) — never driver-rowed
    "q_er_clusters",
    "q_group_reservoir",
    "q_session_ngrams",
    "q_lift_deciles",
    "q_simhash_band_index",
    "q_conformal_interval",
    "q_energy_distance",
    "q_quantile_sketch",
    "q_bipartite_projection",
    "q_knn_graph",
    "q_rrf_fusion",
    "q_mixture_allocation",
    "q_interarrival_stats",
    "q_ngram_novelty",
    "q_length_log2_histogram",
    "q_auc_by_group",
    "q_power_mde",
    "q_bloom_membership",
    "q_gini_coefficient",
    "q_dp_counts",
    "q_holdout_leakage",
    "q_er_golden_record",
    "q_price_elasticity",
    "q_sketch_merge",
    "q_ab_cuped",
    "q_importance_weights",
    # round-9 gate-reds, re-proven post decimal→double fix
    "q_token_chi2",
    "q_ndcg",
    # §2.23 (keys_r10.py) — registered this round, never driver-rowed
    "q_rolling_distinct_hll",
    "q_minhash_signature_index",
    "q_psi_source_panel",
    "q_stratified_conformal",
    "q_token_budget_curriculum",
    "q_kcore_census",
    "q_ivf_assignment",
    "q_cohens_kappa",
    "q_pinball_loss",
    "q_ratio_metric_delta",
    "q_k_anonymity",
    "q_heaps_law",
    "q_source_overlap",
    # §2.24 (keys_r10b.py) — registered this round, never driver-rowed
    "q_cmh_test",
    "q_hill_tail_index",
    "q_log_odds_tokens",
    "q_markov_stationary",
    "q_poisson_rate_test",
    "q_sequence_entropy",
    "q_block_maxima_gumbel",
    # first 2 of the 4 late-round §2.24 keys fill the window (the
    # other two — q_price_index, q_negative_binomial_fit — plus the
    # r5-era backlog rotate in round 11; never-driver-rowed first)
    "q_mrr",
    "q_rank_biased_overlap",
]


def _reorder_first(d: dict, first: list[str]) -> dict:
    out = {k: d[k] for k in first if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


QUERIES = _reorder_first(QUERIES, _VERIFY_FIRST)
ORACLE_SQL = _reorder_first(ORACLE_SQL, _VERIFY_FIRST)
