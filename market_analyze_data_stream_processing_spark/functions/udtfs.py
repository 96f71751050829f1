"""Python UDTFs (Spark 4 table-function surface) — the registration
mechanism the reference lacks (SURVEY §2.10): one row in, N typed rows
out, usable in lateral joins and SQL (`spark.udtf.register`).

The engine-native equivalents (posexplode over array expressions — see
`q_sentence_explode`, `q_doc_chunks`) stay the default: a UDTF runs
Python per row. This surface exists for logic that genuinely cannot be
expressed as Catalyst expressions (custom tokenizers, parsers with
state); the test pins behavior parity against the expression form.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkDocUDTF:
    """Sliding-window chunker as a table function: yields one row per
    (chunk_size, stride) window over whitespace tokens — the UDTF twin
    of ``q_doc_chunks``'s expression form."""

    def eval(self, text: str, chunk_size: int, stride: int):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        n = len(toks)
        i = 0
        idx = 0
        while i < n:
            window = toks[i : i + chunk_size]
            yield idx, " ".join(window), len(window)
            if i + chunk_size >= n:
                break
            i += stride
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL (``chunk_doc(text, 50, 40)``)."""
    spark.udtf.register("chunk_doc", ChunkDocUDTF)
