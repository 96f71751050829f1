"""Oracle-checked query registry — the driver contract surface.

Each module registers named queries with ``register``; ``__spark_entry__``
exposes them via ``queries()`` / ``oracle_sql()``.
"""

from .registry import QUERIES, register  # noqa: F401

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import market  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import media  # noqa: E402,F401
from . import profiling  # noqa: E402,F401

# cumulative driver coverage is 229/229 all-green; each round rotates
# the 50 stalest-evidence names forward (tools/rotate_front.py derives
# the order from CORRECTNESS_r*.json). Round 14: the r08/r09-evidence
# cohort. Semantics are unaffected --
# `queries()`/`oracle_sql()`/bench all expose the same full set.
_SWEEP_FRONT = [
    # newest driver evidence: r08
    "q_cohen_kappa",
    "q_collocations",
    "q_column_profile",
    "q_cross_momentum",
    "q_customer_deciles",
    "q_cusum",
    "q_donchian",
    "q_drawdown",
    "q_dup_rate_by_source",
    "q_embedding_outliers",
    "q_event_paths",
    "q_event_study",
    "q_forecast_eval",
    "q_fuzzy_match",
    "q_gapfill_daily",
    "q_gini_pareto",
    "q_group_mode",
    "q_heavy_hitters",
    "q_hhi",
    "q_higher_moments",
    "q_hurst",
    "q_ichimoku",
    "q_interarrival",
    "q_intraday_profile",
    "q_kaplan_meier",
    "q_keltner",
    "q_key_skew",
    "q_kll_quantile_merge",
    "q_ks_drift",
    "q_kyle_lambda",
    "q_lang_confusion",
    # newest driver evidence: r09
    "q_last_touch",
    "q_lead_lag",
    "q_ljung_box",
    "q_macd",
    "q_mad_outliers",
    "q_market_basket",
    "q_markov_transitions",
    "q_multi_rollup",
    "q_mutual_information",
    "q_ngram_containment",
    "q_ngram_novelty",
    "q_obv",
    "q_oov_rate",
    "q_order_backlog",
    "q_overnight_gaps",
    "q_pagerank",
    "q_pairs_spread",
    "q_pivot_points",
    "q_pq_ann",
]


def _reorder(front: list[str]) -> None:
    missing = [n for n in front if n not in QUERIES]
    assert not missing, f"_SWEEP_FRONT names not in registry: {missing}"
    ordered = {n: QUERIES[n] for n in front}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder(_SWEEP_FRONT)

__all__ = ["QUERIES", "register"]
