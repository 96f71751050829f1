"""Top-level RAG entry point (SURVEY.md §3.3): the reference's
``get_answer(user_query)`` (rag_engine.py:184-417) with the engine parts
distributed and the LLM seams injected.

The answer-generation LLM (U6) is OUT of the engine: per the reference's
own structure, the engine's deliverable is the assembled context + the
sources frame; ``llm=None`` returns the context as the answer (the
deterministic contract used by tests and by any caller that brings its
own model client).
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame

from .operators.retrieval import (
    RouterQuery,
    assemble_context,
    retrieve,
    with_summary_extraction,
)


@dataclass
class RagResult:
    answer: str
    context: str
    sources: list[dict]
    dominant_ticker: str | None
    horizon_seconds: float


def get_answer(
    docs: DataFrame,
    query_text: str,
    embed_query: Callable[[str], Sequence[float]],
    router: Callable[[str, float], RouterQuery] | None = None,
    llm: Callable[[str, str], str] | None = None,
    now: float | None = None,
    k: int = 20,
    top: int = 8,
) -> RagResult:
    """Route → filter → kNN → re-rank → context → (optional) LLM.

    - ``embed_query``: text → vector (U1 query side; rag_engine.py:185)
    - ``router``: text → RouterQuery (U5); defaults to the reference's
      24-hour fallback contract (rag_engine.py:137-145)
    - ``llm``: (system_context, query) → answer (U6); ``None`` ⇒ the
      context itself is returned as the answer
    """
    now = _time.time() if now is None else now
    route = router(query_text, now) if router else RouterQuery.fallback(now)
    qv = [float(x) for x in embed_query(query_text)]

    top_docs = retrieve(docs, qv, route, now, k=k, top=top)
    now_str = _time.strftime("%A %Y-%m-%d %H:%M:%S", _time.gmtime(now))
    context, dominant = assemble_context(top_docs, route, now_str)

    src_rows = (
        with_summary_extraction(top_docs)
        .orderBy("score", ascending=False)
        .collect()
    )
    sources = [
        {
            "ticker": r["ticker"],
            "title": (r["document"] or "")[:100] + "...",
            "link": r["link"],
            "type": r["type"],
            "sentiment": r["sentiment"],
            "timestamp": r["timestamp"],
            "opening_price": r["opening_price"],
            "closing_price": r["closing_price"],
            "variation_pct": r["variation_pct"],
            "volume": r["volume"],
        }
        for r in src_rows
    ]
    answer = llm(context, query_text) if llm else context
    return RagResult(
        answer=answer,
        context=context,
        sources=sources,
        dominant_ticker=dominant,
        horizon_seconds=float(route.end_timestamp - route.start_timestamp),
    )
