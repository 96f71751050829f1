"""Text-analysis scalar expressions (LLM-training-pipeline operators):
tokenization stats, quality scoring, language-ID heuristic, document
fingerprinting, shingling. All pure Catalyst expressions — they run in
whole-stage codegen, no Python in the hot path, so a 100 TB documents
scan is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SQL form of :func:`portable_lower` — oracle queries must lower text
#: with exactly this expression so both engines case-fold identically.
PORTABLE_LOWER_SQL = "translate(lower(translate({col}, 'İ', 'i')), 'ς', 'σ')"


def portable_lower(text: Column) -> Column:
    """Engine-portable case folding for document text.

    A full-codepoint sweep (U+0020..U+10FFFF) of ``lower()`` through
    Spark (Java full case mapping) vs DuckDB (utf8proc simple mapping)
    diverges on exactly two linguistically real inputs plus one
    version-skew class:

    - ``İ`` (U+0130): Java SpecialCasing gives ``i`` + combining dot
      (two codepoints); utf8proc gives plain ``i``. Pre-translating
      İ→i before lower() makes both engines emit ``i`` — which is also
      the Turkish-correct fold.
    - final sigma: Java lowers word-final ``Σ`` contextually to ``ς``;
      utf8proc maps Σ→σ unconditionally. Post-translating ς→σ folds
      BOTH the contextual output and pre-existing final sigmas to σ on
      both engines.
    - ~69 rare letters (Vithkuqi, Garay, late Latin Extended
      additions) where the two libraries simply ship different Unicode
      versions — one side has no mapping yet. These are declared OUT of
      the portability contract (PARITY.md) rather than enumerated,
      because the set is a function of the library pair, not of the
      engine.

    Every tokenizer/normalizer that feeds token IDENTITY (n-gram
    models, BPE counts, distinct-token stats) must lower through this
    function; paths that strip to ``[a-z0-9 ]`` afterwards are immune
    (the divergent codepoints are deleted either way) but use it too
    for uniformity. Found by tools/unicode_clone.py (round 11):
    q_bpe_tokens / q_unigram_logprob / q_bigram_logprob diverged on
    Turkish text before this kernel existed.

    The two translate passes are GUARDED behind byte-search
    ``contains`` probes (İ, Σ, ς — the only codepoints whose presence
    can make the translated fold differ from a bare ``lower()``:
    translate is the identity when its search char is absent, and
    U+03A3 Σ is the sole uppercase letter Java lowers to ς). Rows
    without them — the overwhelming majority of any real corpus — take
    ``lower()``'s ASCII fast path instead of two per-codepoint hashmap
    scans: ~2x cheaper on the sf0.1 documents table, bit-identical
    output on every input (pinned by the trap-string and fuzz
    differentials in tests/test_unicode_portability.py, which run BOTH
    engines). The CASEFOLD_BARE lint recognizes exactly this guarded
    shape (and the unconditional full chain), and rejects partial
    folds that drop the ς post-translate.
    """
    needs_fold = (
        text.contains("İ") | text.contains("Σ") | text.contains("ς")
    )
    full = F.translate(F.lower(F.translate(text, "İ", "i")), "ς", "σ")
    return F.when(needs_fold, full).otherwise(F.lower(text))


#: Tiny embedded stopword lists for the language-ID heuristic.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pas|pour|que|dans)\b",
    "es": r"\b(el|los|las|es|una|por|para|con|del|como)\b",
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def marker_hits(text: Column, pattern: str) -> Column:
    """Count of regex marker-word hits in text (portable case fold:
    Java's İ→i+U+0307 would otherwise split a \\b boundary inside a
    marker word where DuckDB's İ→i keeps it intact)."""
    return F.size(
        F.regexp_extract_all(portable_lower(text), F.lit(pattern), F.lit(0))
    )


def lang_id(text: Column) -> Column:
    """n-gram/stopword language-ID heuristic: most-hit marker list wins;
    ties broken by fixed language order (en > de > fr > es); no hits →
    'unknown'. Deterministic and SQL-expressible for the oracle."""
    hits = {lang: marker_hits(text, pat) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_MARKERS:  # fixed insertion order = tiebreak order
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowercasing."""
    lowered = portable_lower(text)
    stripped = F.regexp_replace(lowered, r"[a-z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    return marker_hits(text, LANG_MARKERS["en"]) / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic doc-quality score in [0,1]: rewards stopword density and
    a sane length, penalizes punctuation noise (the classic C4/Gopher-style
    filters, reduced to deterministic expressions)."""
    n_tok = token_count(text)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
        + F.lit(0.3) * length_term
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(text) * 10.0, F.lit(1.0)))
    )


def mean_word_len(text: Column) -> Column:
    """Mean token length: integer char-sum / token count (one division,
    so the float is bit-identical across engines)."""
    toks = tokens(text)
    char_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return char_sum.cast("double") / F.greatest(F.size(toks), F.lit(1))


def symbol_word_ratio(text: Column) -> Column:
    """Gopher symbol-to-word ratio: '#' and '...' occurrences per token."""
    n_sym = F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), F.lit(0)))
    return n_sym.cast("double") / F.greatest(token_count(text), F.lit(1))


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter."""
    toks = tokens(text)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return n_alpha.cast("double") / F.greatest(F.size(toks), F.lit(1))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    t = portable_lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9 ]", "")
    t = F.regexp_replace(t, r" +", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Content fingerprint = md5 of the normalized text (U7/F9 generalized;
    md5 not Python hash() — stable across runs and engines)."""
    return F.md5(normalized_text(text))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>) from a pre-tokenized array.

    Docs with fewer than n tokens yield an EMPTY array — without the
    guard, sequence(1, size-n+1) turns descending for short docs and
    element_at(toks, 0) hard-fails the job
    (INVALID_ARRAY_INDEX_IN_ELEMENT_AT); one short title must never kill
    a 100 TB dedup run.

    Hot paths should bind ``toks`` to a MATERIALIZED column (a prior
    ``.select(tokens(...).alias("toks"))``), not an inline ``tokens(text)``
    expression: Spark does not common-subexpression-eliminate inside
    ``transform`` lambdas, so an inline regex split is re-executed once
    per ``element_at`` reference — n re-tokenizations per shingle.
    A projection boundary is enough; CollapseProject declines to inline
    non-cheap producer expressions that are consumed more than once."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>) straight from text. Convenience
    form; see shingles_from_tokens for the hot-path variant that avoids
    per-element re-tokenization."""
    return shingles_from_tokens(tokens(text), n)


def gram_run_stats(arr: Column) -> Column:
    """Per-row repetition statistics over a gram array, map-only: returns
    ``struct(top, dup)`` where ``top`` is the highest occurrence count of
    any single gram and ``dup`` is the total number of occurrences of
    grams appearing ≥ 2 times.

    Sort the array so equal grams are adjacent, then one linear fold
    tracks (current run, max run, Σ runs ≥ 2). Zero shuffle at any data
    size — the per-doc alternative (explode → groupBy(doc, gram) →
    groupBy(doc) → join) pays two full shuffle chains for numbers every
    row can compute about itself. Used by the Gopher repetition gate
    (plans/text.q_repetition_filters)."""
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("top"), F.lit(0).alias("dup"),
    )

    def close_run(acc):
        return (
            F.greatest(acc["top"], acc["run"]),
            acc["dup"] + F.when(acc["run"] >= 2, acc["run"]).otherwise(0),
        )

    def step(acc, x):
        top, dup = close_run(acc)
        return F.when(
            x == acc["prev"],
            F.struct(
                x.alias("prev"), (acc["run"] + 1).alias("run"),
                acc["top"].alias("top"), acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"), F.lit(1).alias("run"),
                top.alias("top"), dup.alias("dup"),
            )
        )

    def finish(acc):
        top, dup = close_run(acc)
        return F.struct(top.alias("top"), dup.alias("dup"))

    return F.aggregate(F.array_sort(arr), init, step, finish)
