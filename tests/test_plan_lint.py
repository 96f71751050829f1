"""Physical-plan scale audit stays clean.

Runs the same lint as tools/plan_lint.py (CartesianProduct,
BroadcastNestedLoopJoin, single-partition Window input) over every
registered query and asserts nothing appears outside the ALLOW list —
the allowlist entries are all 1-row-build-side broadcasts whose
justification lives next to the rule in tools/plan_lint.py.

Linted at sf0.001 to keep the eager plan-construction queries (the
localCheckpoint-based ones) fast; join-strategy choices are identical
at these toy sizes, and the committed PLANLINT.md remains the sf0.01
record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_no_unallowlisted_plan_violations(spark):
    from tools.plan_lint import run

    violations, results, errors = run(
        write_md=False, spark=spark, sf_dir="/root/testdata/sf0.001"
    )
    assert violations == {}, f"un-allowlisted plan anti-patterns: {violations}"
    assert errors == {}, f"queries whose plan could not be built: {errors}"


def _lint_df(df):
    from tools.plan_lint import lint_rounds

    return lint_rounds(df._jdf.queryExecution().analyzed().toJSON())


def test_round_native_rule_fires_and_clears(spark):
    """The ROUND_NATIVE detector must flag engine-native round over
    decimal-quantized lineage, pass the coarse-grid identity case, pass
    noisy lineage, and pass the floor-form (stable_round) rewrite —
    otherwise the registry guard above is vacuous."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.scalars import (
        stable_round,
    )

    base = spark.range(5).select(
        (F.col("id") * 1.7).alias("x"),
        F.col("id").cast("decimal(18,8)").alias("d8"),
        F.col("id").cast("decimal(18,2)").alias("d2"),
    )
    # fine-grid decimal -> double -> native round: the driver-red class
    bad = base.select(F.round(F.col("d8").cast("double") / 3.0, 6).alias("v"))
    rounds, _ = _lint_df(bad)
    assert rounds, "fine-grid native round not flagged"
    # coarse grid at round scale: identity on both engines -> clean
    ok_coarse = base.select(
        F.round(F.sum(F.col("d2")).cast("double"), 2).alias("v")
    )
    assert _lint_df(ok_coarse)[0] == []
    # noisy lineage (no quantization anywhere) -> clean
    ok_noisy = base.select(F.round(F.sqrt(F.col("x")), 6).alias("v"))
    assert _lint_df(ok_noisy)[0] == []
    # the prescribed rewrite -> clean (floor-form emits no Round node)
    fixed = base.select(
        stable_round(F.col("d8").cast("double") / 3.0, 6).alias("v")
    )
    assert _lint_df(fixed)[0] == []


def test_libm_unsnapped_rule_fires_and_clears(spark):
    """LIBM_UNSNAPPED must flag a bare exp over decimal lineage (the
    q_portfolio_return exp-ULP class), and clear when the libm result
    is re-snapped — including when the snap lives in a DOWNSTREAM plan
    node reached through an attribute reference."""
    from pyspark.sql import functions as F

    base = spark.range(5).select(
        F.col("id").cast("decimal(28,12)").alias("d")
    )
    bare = base.select(F.exp(F.col("d").cast("double")).alias("g"))
    assert _lint_df(bare)[1], "bare exp over decimal lineage not flagged"
    # quantize-after in the same expression -> clean
    snapped = base.select(
        F.exp(F.col("d").cast("double")).cast("decimal(28,12)").alias("g")
    )
    assert _lint_df(snapped)[1] == []
    # snap in a downstream node (cross-node alias resolution) -> clean
    staged = base.select(F.exp(F.col("d").cast("double")).alias("g"))
    downstream = staged.select(F.col("g").cast("decimal(28,12)").alias("gq"))
    assert _lint_df(downstream)[1] == []
    # sqrt is correctly rounded per IEEE-754: never flagged
    s = base.select(F.sqrt(F.col("d").cast("double")).alias("v"))
    assert _lint_df(s)[1] == []


def test_libm_per_consumer_accounting(spark):
    """Round-11 tightening: a snap in ONE consumer must not exonerate an
    alias that ANOTHER value-position consumer reads raw; passthrough
    projections (bare reference in a non-root node) stay exempt."""
    from pyspark.sql import functions as F

    base = spark.range(5).select(
        F.col("id").cast("decimal(28,12)").alias("d")
    )
    staged = base.select(F.exp(F.col("d").cast("double")).alias("g"))
    # snapped in one output column, emitted RAW in another (plan root)
    dual = staged.select(
        F.col("g").cast("decimal(28,12)").alias("gq"), F.col("g")
    )
    assert _lint_df(dual)[1], (
        "alias snapped in one consumer but emitted raw at plan root "
        "must be flagged"
    )
    # passthrough Project between the libm alias and its snap -> clean
    passthrough = staged.select("g", F.lit(1).alias("z")).select(
        F.col("g").cast("decimal(28,12)").alias("gq")
    )
    assert _lint_df(passthrough)[1] == []
    # boolean-predicate consumption is exempt (measure-zero boundary)
    pred = staged.select(
        F.col("g").cast("decimal(28,12)").alias("gq"),
        (F.col("g") > 1.0).alias("big"),
    )
    assert _lint_df(pred)[1] == []


def test_round_native_double_sum_breaks_coarse_proof(spark):
    """Round-11 tightening: a DOUBLE-typed Sum between the round and its
    decimal sources must FAIL the SAFE_COARSE proof (accumulated error
    ~n*ulp(sum) can reach a half-boundary); a DECIMAL Sum still passes."""
    from pyspark.sql import functions as F

    base = spark.range(5).select(F.col("id").cast("decimal(18,2)").alias("d2"))
    # double re-accumulation of grid values -> proof fails -> flagged
    bad = base.select(
        F.round(F.sum(F.col("d2").cast("double")), 2).alias("v")
    )
    assert _lint_df(bad)[0], "native round over double Sum not flagged"
    # exact decimal Sum keeps the scale-2 grid -> round(2) is identity
    ok = base.select(
        F.round(F.sum(F.col("d2")).cast("double"), 2).alias("v")
    )
    assert _lint_df(ok)[0] == []


def test_casefold_bare_rule_fires_and_clears(spark):
    """CASEFOLD_BARE must flag a bare lower()/upper() over corpus-text
    lineage (including through a cross-projection alias) and clear the
    portable_lower form and non-text lowers — otherwise the registry
    guard is vacuous against reintroducing the round-11 unicode reds."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.text import (
        portable_lower,
    )
    from tools.plan_lint import lint_casefold

    def hits(df):
        return lint_casefold(df._jdf.queryExecution().analyzed().toJSON())

    docs = spark.createDataFrame([(1, "İstanbul Text")], ["doc_id", "text"])

    assert hits(docs.select(F.lower("text"))), "bare lower must fire"
    assert hits(docs.select(F.upper("text"))), "bare upper must fire"
    # through an alias computed in an upstream projection
    aliased = docs.select(F.col("text").alias("body")).select(
        F.lower("body").alias("lo")
    )
    assert hits(aliased), "alias-indirected bare lower must fire"
    # lower over a derived-from-text expression is still text lineage
    assert hits(docs.select(F.lower(F.regexp_replace("text", r"\s+", " "))))

    assert not hits(docs.select(portable_lower(F.col("text")))), (
        "portable_lower is the sanctioned form"
    )
    # lower over non-text string lineage (hex digests) is ASCII-safe
    assert not hits(docs.select(F.lower(F.hex(F.xxhash64("doc_id")))))

    # PARTIAL folds must fire (round-11 advisory): each drops one of
    # the two divergent-codepoint rewrites, so it still desyncs
    # cross-engine on the one it dropped.
    assert hits(
        docs.select(F.lower(F.translate("text", "İ", "i")))
    ), "İ pre-translate without the ς post-translate must fire"
    assert hits(
        docs.select(F.translate(F.lower("text"), "ς", "σ"))
    ), "ς post-translate without the İ pre-translate must fire"
    # guarded shape with an incomplete probe set must fire too: a
    # guard that never probes Σ routes word-final-sigma rows through
    # the bare-lower branch
    incomplete = F.when(
        F.col("text").contains("İ"),
        F.translate(F.lower(F.translate("text", "İ", "i")), "ς", "σ"),
    ).otherwise(F.lower("text"))
    assert hits(docs.select(incomplete)), (
        "guarded fold probing only İ (not Σ/ς) must fire"
    )
    # Round-12 advisory closures: the probes must reference the SAME
    # input the fold transforms — a guard probing a DIFFERENT column
    # (all three codepoints!) routes unprobed text rows through the
    # bare-lower branch and must fire.
    docs2 = spark.createDataFrame(
        [(1, "İstanbul Text", "other")], ["doc_id", "text", "meta"]
    )
    chain = F.translate(F.lower(F.translate("text", "İ", "i")), "ς", "σ")
    wrong_probe = F.when(
        F.col("meta").contains("İ")
        | F.col("meta").contains("Σ")
        | F.col("meta").contains("ς"),
        chain,
    ).otherwise(F.lower("text"))
    assert hits(docs2.select(wrong_probe)), (
        "guard probing a different column than the fold must fire"
    )
    # ...and a multi-branch CASE whose EXTRA value branch does a bare
    # upper()/lower() over text must fire even though the guarded-fold
    # machinery around it is valid (the extra branch is scanned, not
    # skipped).
    probes = (
        F.col("text").contains("İ")
        | F.col("text").contains("Σ")
        | F.col("text").contains("ς")
    )
    extra_branch = (
        F.when(probes, chain)
        .when(F.col("doc_id") > 5, F.upper("text"))
        .otherwise(F.lower("text"))
    )
    assert hits(docs2.select(extra_branch)), (
        "extra bare-upper value branch inside a sanctioned CASE must fire"
    )
    # the full unconditional chain stays sanctioned
    assert not hits(
        docs.select(
            F.translate(F.lower(F.translate("text", "İ", "i")), "ς", "σ")
        )
    )


def test_money_sum_double_rule_fires_and_clears(spark):
    """MONEY_SUM_DOUBLE must flag a DOUBLE-typed Sum over cent-grid
    money lineage (the round-11 sf1 reds) and clear the DECIMAL
    accumulation idiom and exempt columns (integer-valued quantities)."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.scalars import (
        money2,
        one_minus_rate,
    )
    from tools.plan_lint import lint_money_sums

    def hits(df):
        return lint_money_sums(df._jdf.queryExecution().analyzed().toJSON())

    def dbl(df):
        return hits(df).get("MONEY_SUM_DOUBLE")

    l = spark.createDataFrame(
        [(100.25, 0.05, 3.0)], ["l_extendedprice", "l_discount", "l_quantity"]
    )
    assert dbl(l.agg(F.sum("l_extendedprice")))
    assert dbl(l.agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))))
    # through a cross-projection alias
    assert dbl(
        l.select((F.col("l_extendedprice") * 2).alias("px")).agg(F.sum("px"))
    )
    assert not dbl(
        l.agg(F.sum(money2("l_extendedprice") * one_minus_rate("l_discount")))
    ), "DECIMAL accumulation is the sanctioned form"
    assert not dbl(l.agg(F.sum("l_quantity"))), "integer-grid qty sums exactly"
    # Average shares the accumulation-order drift (same numerator)
    assert dbl(l.agg(F.avg("l_extendedprice")))
    assert dbl(l.agg(F.avg("l_discount"))), "rate columns are cent-grid too"
    assert not dbl(
        l.agg(F.sum(money2("l_extendedprice")).cast("double") / F.count(F.lit(1)))
    ), "exact-decimal-numerator mean is the sanctioned form"


def test_money_sum_long_and_wide_rules(spark):
    """Round-13 additions: MONEY_SUM_LONG_UNSPLIT must flag a bare LONG
    money sum (no grid_sum_parts hi/lo split, so no overflow-headroom
    analysis travels with it) and clear the split form — including the
    WINDOW split form whose Pmod lives behind a projection alias; and
    WIDE_DECIMAL_SUM must report a DECIMAL(p>=9) money sum so run()
    can flag it as GRID_SUM_FULLSCAN on join-free plans."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.scalars import (
        grid_long,
        grid_sum_parts,
        money2,
    )
    from tools.plan_lint import lint_money_sums

    def hits(df):
        return lint_money_sums(df._jdf.queryExecution().analyzed().toJSON())

    l = spark.createDataFrame(
        [(100.25, 0.05, 1)], ["l_extendedprice", "l_discount", "k"]
    )
    bare = l.agg(F.sum(grid_long("l_extendedprice")))
    assert hits(bare).get("MONEY_SUM_LONG_UNSPLIT"), "bare LONG money sum must warn"
    split = l.agg(*grid_sum_parts(grid_long("l_extendedprice"), "x", 2))
    assert not hits(split).get("MONEY_SUM_LONG_UNSPLIT"), (
        "the hi/lo split form is the sanctioned LONG accumulation"
    )
    # window split form: hi/lo computed in a lower projection, the
    # window Sum sees only attribute refs — Pmod detection must
    # resolve aliases (the q_cumulative_spend shape)
    w = Window.partitionBy("k").orderBy("l_extendedprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    u = grid_long("l_extendedprice")
    lo = F.pmod(u, F.lit(100))
    hi = ((u - lo) / F.lit(100)).cast("long")
    win = l.select(
        F.sum(hi).over(w).alias("__c_hi"), F.sum(lo).over(w).alias("__c_lo")
    )
    assert not hits(win).get("MONEY_SUM_LONG_UNSPLIT"), (
        "alias-indirected Pmod split must stay sanctioned"
    )
    wide = l.agg(F.sum(money2("l_extendedprice")))
    assert hits(wide).get("WIDE_DECIMAL_SUM"), (
        "DECIMAL(12,2) sum carries a 22-digit buffer — must be reported "
        "for the GRID_SUM_FULLSCAN shape gate"
    )
    narrow = l.agg(F.sum(F.col("l_discount").cast("decimal(4,2)")))
    assert not hits(narrow).get("WIDE_DECIMAL_SUM"), (
        "DECIMAL(4,2) buffer (14 digits) stays on the compact-long path"
    )


def test_grid_sum_fullscan_join_gate(spark):
    """The GRID_SUM_FULLSCAN shape gate: a wide-DECIMAL money sum flags
    only on JOIN-FREE plans (where grid_sum_parts measured ~2x);
    join-bearing money sums keep DECIMAL by measurement and must stay
    exempt by shape."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.scalars import money2
    from tools.plan_lint import lint_money_sums, plan_has_join

    l = spark.createDataFrame([(1, 100.25)], ["k", "l_extendedprice"])
    dim = spark.createDataFrame([(1, "x")], ["k", "name"])

    def parts(df):
        js = df._jdf.queryExecution().analyzed().toJSON()
        return lint_money_sums(js).get("WIDE_DECIMAL_SUM"), plan_has_join(js)

    wide, joined = parts(l.agg(F.sum(money2("l_extendedprice"))))
    assert wide and not joined, "join-free wide sum must gate to FULLSCAN"
    wide, joined = parts(
        l.join(dim, "k").agg(F.sum(money2("l_extendedprice")))
    )
    assert wide and joined, "join-bearing wide sum must be exempt by shape"
    # A join NESTED inside a subquery expression's embedded plan must
    # also count: plan_has_join walks nested dict/list values, not just
    # the top-level node list, so a join-dominated plan whose only Join
    # lives in an IN-subquery does not misfire as GRID_SUM_FULLSCAN.
    l.createOrReplaceTempView("phj_l")
    dim.createOrReplaceTempView("phj_dim")
    sub = spark.sql(
        "SELECT sum(CAST(l_extendedprice AS decimal(12,2))) AS s "
        "FROM phj_l WHERE k IN "
        "(SELECT a.k FROM phj_dim a JOIN phj_dim b ON a.k = b.k)"
    )
    _, joined_sub = parts(sub)
    assert joined_sub, "join inside a subquery expression must be visible"
