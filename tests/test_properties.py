"""Property-based tests (hypothesis) for the expression kernels: each
example batch becomes ONE DataFrame round trip, keeping Spark action
count low while fuzzing values."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.functions.scalars import (
    pct_change,
    stable_round,
)
from market_analyze_data_stream_processing_spark.functions.vectors import (
    as_double,
    cosine_sim,
)
from market_analyze_data_stream_processing_spark.operators.analytics import keep_last

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=40))
def test_pct_change_matches_python_reference(spark, pairs):
    df = spark.createDataFrame(
        [(i, c, p) for i, (c, p) in enumerate(pairs)], "i long, cur double, prev double"
    )
    got = {
        r["i"]: r["x"]
        for r in df.select("i", pct_change(F.col("cur"), F.col("prev")).alias("x")).collect()
    }
    for i, (cur, prev) in enumerate(pairs):
        expect = 0.0 if prev == 0 else (cur - prev) / prev * 100.0
        assert got[i] == expect or math.isclose(got[i], expect, rel_tol=1e-12)


@settings(max_examples=5, deadline=None)
@given(st.lists(finite, min_size=1, max_size=40), st.integers(min_value=0, max_value=6))
def test_stable_round_matches_floor_formula_and_is_idempotent(spark, vals, d):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    out = df.select(
        "i",
        stable_round(F.col("v"), d).alias("r1"),
        stable_round(stable_round(F.col("v"), d), d).alias("r2"),
    ).collect()
    p = float(10**d)
    for r in out:
        v = vals[r["i"]]
        assert r["r1"] == math.floor(v * p + 0.5) / p
        assert r["r2"] == r["r1"]  # idempotent


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 1000), finite),
        min_size=1,
        max_size=40,
    )
)
def test_keep_last_one_row_per_key_with_max_order(spark, rows):
    df = spark.createDataFrame(
        [(k, s, v) for k, s, v in rows], "k string, seq long, v double"
    )
    out = keep_last(df, key="k", order="seq").collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))  # exactly one row per key
    best = {}
    for k, s, v in rows:
        if k not in best or s > best[k]:
            best[k] = s
    assert {r["k"]: r["seq"] for r in out} == best


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=1, max_size=30))
def test_shingles_never_crash_and_count_is_exact(spark, texts):
    """For ANY text (unicode, whitespace runs, empty): shingles() must not
    throw, and the shingle count equals max(0, n_tokens - n + 1)."""
    from market_analyze_data_stream_processing_spark.functions.text import (
        shingles,
        tokens,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    out = df.select(
        "i",
        F.size(shingles(F.col("t"), 3)).alias("n_sh"),
        F.size(tokens(F.col("t"))).alias("n_tok"),
    ).collect()
    for r in out:
        assert r["n_sh"] == max(0, r["n_tok"] - 2)


@settings(max_examples=3, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=20, max_size=60, unique=True))
def test_hash_split_deterministic_partition(spark, ids):
    """Hash-split membership is a pure function of the id: re-running on a
    reshuffled frame yields identical memberships, and the three splits
    partition the id set."""
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "cd", "train").when(h < "e6", "val").otherwise("test")

    def run(rows):
        df = spark.createDataFrame([(i,) for i in rows], "doc_id long")
        return {r["doc_id"]: r["s"] for r in df.select("doc_id", split.alias("s")).collect()}

    a = run(ids)
    b = run(list(reversed(ids)))
    assert a == b
    assert set(a) == set(ids) and set(a.values()) <= {"train", "val", "test"}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, allow_infinity=False),
            min_size=4,
            max_size=4,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=1,
        max_size=20,
    )
)
def test_cosine_similarity_bounds_and_self_similarity(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "i long, v array<double>",
    )
    out = df.select(
        "i", cosine_sim(as_double(F.col("v")), as_double(F.col("v"))).alias("self_sim")
    ).collect()
    for r in out:
        assert abs(r["self_sim"] - 1.0) < 1e-9


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == plain union-find on any graph
    (self-loops and duplicate edges included)."""
    from market_analyze_data_stream_processing_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "id_a", "id_b", max_iter=40).collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min of each union-find class
    cls: dict = {}
    for n in parent:
        cls.setdefault(find(n), []).append(n)
    expect = {n: min(m) for r, m in cls.items() for n in m}
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), finite),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    """The union+window lowering == pandas.merge_asof (backward,
    exact-match allowed) on arbitrary keyed event sets."""
    import pandas as pd

    from market_analyze_data_stream_processing_spark.operators.asof import asof_join

    # unique right (key, ts) — the documented precondition
    rdedup = {}
    for k, t, v in rrows:
        rdedup[(k, t)] = v
    rr = [(k, t, v) for (k, t), v in rdedup.items()]
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, lt long, lid long"
    )
    right = spark.createDataFrame(rr, "k long, rt long, rv double")
    got = {
        r["lid"]: (r["rt"], r["rv"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt", right_cols=["rv"]
        ).collect()
    }
    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], columns=["k", "lt", "lid"]
    ).sort_values("lt", kind="stable")
    rp = pd.DataFrame(rr, columns=["k", "rt", "rv"]).sort_values("rt", kind="stable")
    m = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k", direction="backward"
    )
    for row in m.itertuples():
        want_rt = None if pd.isna(row.rt) else int(row.rt)
        want_rv = None if pd.isna(row.rv) else float(row.rv)
        assert got[row.lid] == (want_rt, want_rv), (row.lid, got[row.lid])


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5), st.integers(-100, 100)),
        min_size=1,
        max_size=60,
    )
)
def test_in_batch_group_min_rejection_equals_pairwise(spark, rows):
    """The dedup index resolves within-batch collisions with a per-group
    min aggregate; prove its rejected set equals the O(n^2) pairwise
    self-join form on arbitrary (doc_id, band, h) key sets."""
    bk = spark.createDataFrame(
        [(d, b, h) for d, b, h in rows], "doc_id long, band int, h long"
    )
    grp_min = bk.groupBy("band", "h").agg(F.min("doc_id").alias("existing_id"))
    agg_rejected = {
        r["new_id"]
        for r in bk.join(grp_min, ["band", "h"])
        .where(F.col("doc_id") > F.col("existing_id"))
        .select(F.col("doc_id").alias("new_id"))
        .distinct()
        .collect()
    }
    a, b = bk.alias("a"), bk.alias("b")
    pair_rejected = {
        r["new_id"]
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("new_id"))
        .distinct()
        .collect()
    }
    assert agg_rejected == pair_rejected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # vec_id (dedup below)
            st.integers(min_value=0, max_value=2),  # block label
            st.lists(finite, min_size=4, max_size=4),  # embedding
        ),
        min_size=2,
        max_size=24,
    )
)
def test_near_dup_kernel_matches_hof_fold_exactly(spark, rows):
    """The numpy near-dup kernel claims BITWISE parity with the
    sequential HOF fold (k-ordered accumulation). Prove it: the
    applyInPandas operator and an inline fold-based join must emit
    identical (id_a, id_b, sim) sets — exact float equality after the
    shared round(·, 6), no tolerance."""
    from market_analyze_data_stream_processing_spark.functions.vectors import (
        dot,
        l2_norm,
    )
    from market_analyze_data_stream_processing_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    seen = set()
    uniq = []
    for vid, blk, vec in rows:
        # zero-NORM vectors (incl. values whose squares underflow float64)
        # have no defined cosine: the kernel drops them, the ANSI fold
        # raises DIVIDE_BY_ZERO — keep them out of the parity comparison
        if vid not in seen and any(x * x > 0.0 for x in vec):
            seen.add(vid)
            uniq.append((vid, vec, blk))
    if len(uniq) < 2:
        return
    df = spark.createDataFrame(
        uniq, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in embedding_near_dup_pairs(df, threshold=-2.0).collect()
    }
    base = df.select(
        "label", "vec_id", F.col("embedding").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = base.select(
        "label", F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = base.select(
        "label", F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    want = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in a.join(b, ["label"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .collect()
    }
    assert got == want  # exact equality, including every rounded sim


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=1), finite),
        min_size=1,
        max_size=50,
    )
)
def test_running_sum_ma_equals_frame_sum_ma(spark, rows):
    """The O(1)-per-row running-sum-difference MA must equal the
    O(frame) sliding-frame form EXACTLY (decimal arithmetic), for every
    window size — the equivalence q_ma_rolling's rewrite rests on."""
    from pyspark.sql import Window

    from market_analyze_data_stream_processing_spark.functions.scalars import (
        stable_round as sr,
    )

    data = [(str(k), i, float(v)) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "ticker string, seq long, price double")
    base = Window.partitionBy("ticker").orderBy("seq")
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn(
        "s", F.sum(F.col("price").cast("decimal(18,4)")).over(run)
    ).withColumn("c", F.count("price").over(run))
    for n in (1, 3, 10):
        frame = base.rowsBetween(-(n - 1), 0)
        s_n = F.col("s") - F.coalesce(
            F.lag("s", n).over(base), F.lit(0).cast("decimal(28,4)")
        )
        c_n = F.col("c") - F.coalesce(F.lag("c", n).over(base), F.lit(0))
        cmp = out.select(
            sr(s_n.cast("double") / c_n, 4).alias("fast"),
            sr(
                F.sum(F.col("price").cast("decimal(18,4)")).over(frame).cast("double")
                / F.count("price").over(frame),
                4,
            ).alias("slow"),
        ).collect()
        assert all(r["fast"] == r["slow"] for r in cmp), f"MA{n} diverged"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=10),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_jaccard_pairs_matches_bruteforce(spark, token_lists, df_cap):
    """The window-DF-pruned inverted index == per-pair brute force on any
    corpus, including the pruning semantics: a shingle appearing in more
    than df_cap documents is dropped from BOTH the pair candidates and
    the per-doc set sizes before Jaccard is computed."""
    from market_analyze_data_stream_processing_spark.operators.dedup import (
        jaccard_pairs,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["jaccard"])
        for r in jaccard_pairs(
            df, shingle_n=3, threshold=0.1, max_shingle_df=df_cap
        ).collect()
    }

    # Brute-force reference: distinct 3-gram shingles per doc, global DF
    # pruning at df_cap, then exact pairwise Jaccard over the pruned sets.
    sets = {}
    for i, toks in enumerate(token_lists):
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if sh:
            sets[i] = sh
    df_count: dict = {}
    for sh in sets.values():
        for s in sh:
            df_count[s] = df_count.get(s, 0) + 1
    pruned = {
        i: {s for s in sh if df_count[s] <= df_cap} for i, sh in sets.items()
    }
    expect = {}
    ids = sorted(pruned)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            common = pruned[a] & pruned[b]
            if not common:
                continue
            jac = len(common) / (len(pruned[a]) + len(pruned[b]) - len(common))
            if jac >= 0.1:
                expect[(a, b)] = (len(common), jac)
    assert set(got) == set(expect)
    for k, (n, jac) in expect.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], jac, rel_tol=1e-12)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_gram_run_stats_matches_counter(spark, gram_lists):
    """The map-only run-length fold == collections.Counter on any gram
    multiset: top = max count of one gram, dup = total occurrences of
    grams appearing >= 2 times."""
    from collections import Counter

    from market_analyze_data_stream_processing_spark.functions.text import (
        gram_run_stats,
    )

    df = spark.createDataFrame(
        [(i, [str(g) for g in grams]) for i, grams in enumerate(gram_lists)],
        "i long, grams array<string>",
    )
    got = {
        r["i"]: (r["s"]["top"], r["s"]["dup"])
        for r in df.select("i", gram_run_stats(F.col("grams")).alias("s")).collect()
    }
    for i, grams in enumerate(gram_lists):
        c = Counter(grams)
        top = max(c.values(), default=0)
        dup = sum(v for v in c.values() if v >= 2)
        assert got[i] == (top, dup), (i, grams)
