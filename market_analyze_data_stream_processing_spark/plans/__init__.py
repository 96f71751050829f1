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
# the order from CORRECTNESS_r*.json). Round 13: the r07/r08-evidence
# cohort. Semantics are unaffected --
# `queries()`/`oracle_sql()`/bench all expose the same full set.
_SWEEP_FRONT = [
    # newest driver evidence: r07
    "q_decontaminate",
    "q_doc_chunks",
    "q_doc_exact_dedup",
    "q_doc_fingerprint",
    "q_doc_source_stats",
    "q_domain_mix_sample",
    "q_dq_checks",
    "q_embedding_centroids",
    "q_ewma",
    "q_funnel_conversion",
    "q_gopher_filters",
    "q_grouped_pandas_quantiles",
    "q_grouping_sets",
    "q_hash_split",
    "q_histogram_buckets",
    "q_humanize_fmt",
    "q_null_semantics",
    "q_parse_date_flexible",
    "q_range_frame_window",
    "q_rank_distribution_family",
    "q_redact_tokens",
    "q_sentence_explode",
    "q_stratified_sample",
    "q_string_agg",
    "q_string_functions",
    "q_tfidf_top_tokens",
    "q_token_frequency",
    "q_token_pack",
    "q_unigram_logprob",
    "q_unpivot_ohlc",
    "q_window_lead_first",
    "q_zorder_values",
    # newest driver evidence: r08
    "q_ab_test",
    "q_amihud",
    "q_aroon",
    "q_atr",
    "q_autocorr",
    "q_benford",
    "q_beta_daily",
    "q_bigram_logprob",
    "q_bloom_decontaminate",
    "q_bm25",
    "q_bollinger",
    "q_boolean_search",
    "q_candlestick",
    "q_capped_growth",
    "q_cci",
    "q_char_entropy",
    "q_chi2_mix",
    "q_cmf_adl",
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
