"""Enrichment UDF stage (SURVEY.md §2.10 U1/U3/U4): embedding, sentiment,
translation — the reference's per-row model calls (consumer.py:160-172)
re-expressed as Arrow-batched pandas UDFs.

The reference calls SentenceTransformer/VADER/GoogleTranslator one row at
a time — its central scalability defect. Here each is a vectorized
pandas_udf: at 100 TB the models are loaded once per executor (lazy
module-level init inside the UDF) and fed Arrow batches.

Determinism seams (SURVEY §5.4): real models aren't in this container,
so each UDF has a deterministic stand-in with the same signature and
output type; the real path is behind an import-try. Tests pin the
stand-ins.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StringType

EMBEDDING_DIM = 384  # all-MiniLM-L6-v2 (config.py:23)


def _hash_projection_embed(texts: pd.Series, dim: int = EMBEDDING_DIM) -> pd.Series:
    """Deterministic stand-in for MiniLM: token-hash feature projection,
    L2-normalized. Same contract (dim, unit norm, text-sensitive); no
    model weights needed."""
    out = []
    for t in texts.astype(str):
        v = np.zeros(dim, dtype=np.float64)
        for i, tok in enumerate(re.findall(r"\w+", t.lower())):
            h = hash_token(tok)
            v[h % dim] += 1.0 + 0.1 * ((h >> 16) % 7)
        n = np.linalg.norm(v)
        out.append((v / n if n else v).astype(np.float32))
    return pd.Series(out)


def hash_token(tok: str) -> int:
    """FNV-1a 32-bit — stable across processes (unlike Python hash())."""
    h = 2166136261
    for ch in tok.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def _try_real_encoder():
    try:  # pragma: no cover - model not present in test env
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")
        return lambda s: pd.Series(list(model.encode(s.astype(str).tolist())))
    except Exception:
        return None


def make_embedding_udf(use_real_model: bool = False):
    """U1: ``encode(f"{ticker}: {title}")`` → 384-dim vector
    (consumer.py:171-172). pandas_udf, Arrow-batched."""
    real = _try_real_encoder() if use_real_model else None
    fn = real or _hash_projection_embed

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return fn(texts)

    return embed


#: Minimal deterministic polarity lexicon (VADER-style compound stand-in).
_POS_WORDS = {
    "gain", "gains", "up", "rally", "surge", "beat", "strong", "growth",
    "record", "bullish", "soars", "profit", "positive", "good", "great",
}
_NEG_WORDS = {
    "loss", "losses", "down", "fall", "drop", "miss", "weak", "decline",
    "crash", "bearish", "plunge", "negative", "bad", "fears", "warning",
}


def _lexicon_sentiment(texts: pd.Series) -> pd.Series:
    """Stand-in for VADER compound: tanh-squashed (pos-neg)/sqrt(n) in
    [-1, 1] — deterministic, text-sensitive, same range. Vectorized over
    the Arrow batch: one str.findall + two exploded isin-sums, no Python
    row loop."""
    toks = texts.astype(str).str.lower().str.findall(r"\w+")
    n = toks.str.len()
    exploded = toks.explode()
    pos = exploded.isin(_POS_WORDS).groupby(level=0).sum().reindex(toks.index, fill_value=0)
    neg = exploded.isin(_NEG_WORDS).groupby(level=0).sum().reindex(toks.index, fill_value=0)
    denom = np.maximum(np.sqrt(n.clip(lower=1).to_numpy(dtype=float)), 1.0)
    return pd.Series(
        np.tanh((pos.to_numpy(dtype=float) - neg.to_numpy(dtype=float)) / denom),
        index=texts.index,
    )


def _try_real_vader():
    try:  # pragma: no cover
        from vaderSentiment.vaderSentiment import SentimentIntensityAnalyzer

        an = SentimentIntensityAnalyzer()
        return lambda s: s.astype(str).map(lambda t: an.polarity_scores(t)["compound"])
    except Exception:
        return None


def make_sentiment_udf(use_real_model: bool = True):
    """U3: VADER compound sentiment in [-1, 1] (consumer.py:168-169).
    VADER is pure-Python and deterministic, so the real path is preferred
    when importable; the lexicon stand-in keeps the same contract."""
    real = _try_real_vader() if use_real_model else None
    fn = real or _lexicon_sentiment

    @F.pandas_udf(DoubleType())
    def sentiment(texts: pd.Series) -> pd.Series:
        return fn(texts)

    return sentiment


def make_translation_udf(table: dict[str, str] | None = None):
    """U4: auto→en translation with fallback-to-original on failure
    (consumer.py:160-166). Stand-in: lookup table else identity — the
    reference's error-fallback contract (translate fails ⇒ original text)
    is exactly the identity path."""
    lookup = table or {}

    @F.pandas_udf(StringType())
    def translate(texts: pd.Series) -> pd.Series:
        return texts.astype(str).map(lambda t: lookup.get(t, t))

    return translate


def sentiment_text_expr():
    """Text selection for sentiment (consumer.py:156-160): summary else
    title; '{title}. {content}' when content present."""
    return F.when(
        F.col("content").isNotNull() & (F.length("content") > 0),
        F.concat(F.col("title"), F.lit(". "), F.col("content")),
    ).otherwise(F.coalesce(F.col("summary"), F.col("title")))


def embed_text_expr():
    """Embedding input (consumer.py:171): ``f"{ticker}: {title}"``."""
    return F.concat_ws(": ", F.col("ticker"), F.col("title"))
