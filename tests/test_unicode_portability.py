"""Cross-engine case-folding portability (round 11).

tools/unicode_clone.py injected multibyte text into documents and the
full-registry differential found 3 reds (q_bpe_tokens,
q_unigram_logprob, q_bigram_logprob): Spark lowers with Java's FULL
case mapping (İ → i + U+0307, contextual final ς) while DuckDB lowers
with utf8proc's simple mapping (İ → i, Σ → σ unconditionally), so any
operator whose output depends on token IDENTITY diverged on Turkish
and Greek text. ``functions.text.portable_lower`` folds the two
real divergences (pre-translate İ→i, post-translate ς→σ) so both
engines produce identical bytes; these tests pin that contract
directly against DuckDB, independent of the registry differential.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from market_analyze_data_stream_processing_spark.functions.text import (
    PORTABLE_LOWER_SQL,
    lang_id,
    portable_lower,
    punct_ratio,
)

TRAPS = [
    "İstanbul ışık ISTANBUL istanbul IŞIK",
    "ΣΟΦΟΣ σοφός λόγος τέλος ς",
    "straße STRASSE Straẞe groß GROẞ",
    "café résumé naïve",
    "café résumé naïve",  # NFD twin
    "東京の市場データ 🚀 mixed ＦＵＬＬwidth",
    "İt İs the İN crowd",  # İ adjacent to stopwords: \b boundary trap
    "",
    "plain ascii text stays plain ascii text",
]


@pytest.fixture(scope="module")
def trap_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TRAPS)], ["i", "text"])


def test_portable_lower_matches_duckdb(trap_df):
    got = {
        r["i"]: r["lo"]
        for r in trap_df.select("i", portable_lower(F.col("text")).alias("lo")).collect()
    }
    con = duckdb.connect()
    expr = PORTABLE_LOWER_SQL.format(col="?")
    for i, t in enumerate(TRAPS):
        want = con.execute(f"SELECT {expr}", [t]).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_portable_lower_folds_the_two_divergences(trap_df):
    rows = dict(
        trap_df.select("i", portable_lower(F.col("text")).alias("lo")).collect()
    )
    # İ folds to plain i (no combining dot), the Turkish-correct mapping
    assert rows[0] == "istanbul ışık istanbul istanbul işik"
    # every sigma (capital, medial, pre-existing final) folds to σ
    assert rows[1] == "σοφοσ σοφόσ λόγοσ τέλοσ σ"
    # everything else is Java lower = utf8proc lower (ẞ→ß, NFC≠NFD kept)
    assert rows[2] == "straße strasse straße groß groß"
    assert rows[3] != rows[4]  # NFC and NFD stay distinct codepoints


def test_marker_hits_survive_dotted_capital_I(trap_df):
    """'İt İs ... İN' must hit the en stopword list identically on both
    engines: Java's bare lower() would emit i+U+0307 and break the \\b
    word boundary inside 'it'/'is'/'in' that DuckDB's i keeps intact."""
    row = (
        trap_df.filter("i = 6")
        .select(lang_id(F.col("text")).alias("lang"))
        .collect()[0]
    )
    con = duckdb.connect()
    expr = PORTABLE_LOWER_SQL.format(col="?")
    n = con.execute(
        f"SELECT len(regexp_extract_all({expr},"
        r" '\b(the|and|of|to|is|in|that|it|for|with)\b'))",
        [TRAPS[6]],
    ).fetchone()[0]
    assert n == 4  # it, is, the, in
    assert row["lang"] == "en"


def test_punct_ratio_identical_on_multibyte(trap_df):
    got = {
        r["i"]: r["pr"]
        for r in trap_df.select(
            "i", punct_ratio(F.col("text")).alias("pr")
        ).collect()
    }
    con = duckdb.connect()
    expr = PORTABLE_LOWER_SQL.format(col="?")
    for i, t in enumerate(TRAPS):
        if not t:
            continue
        want = con.execute(
            f"SELECT CAST(length(regexp_replace({expr}, '[a-z0-9 ]', '', 'g'))"
            f" AS DOUBLE) / greatest(length(?), 1)",
            [t, t],
        ).fetchone()[0]
        assert got[i] == want, (t, got[i], want)


def test_portable_lower_fuzz_batch(spark):
    """Seeded fuzz over realistic script blocks (Latin/Greek/Cyrillic/
    Arabic/Hebrew/CJK/kana/Hangul/emoji/combining marks): one batched
    pass through Spark and DuckDB must agree byte-for-byte. Blocks are
    chosen to exclude the documented Unicode-version-skew letters
    (Vithkuqi, Garay, late Latin-Extended — out of contract, see
    PARITY.md row 14)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.text import (
        PORTABLE_LOWER_SQL,
        portable_lower,
    )

    blocks = [
        (0x0020, 0x007E),  # ASCII
        (0x00A0, 0x024F),  # Latin-1 + Latin Extended-A/B
        (0x0370, 0x03FF),  # Greek (incl. Σ/σ/ς)
        (0x0400, 0x04FF),  # Cyrillic
        (0x0590, 0x05F4),  # Hebrew
        (0x0600, 0x06FF),  # Arabic
        (0x0300, 0x036F),  # combining marks
        (0x3040, 0x30FF),  # hiragana + katakana
        (0x4E00, 0x4FFF),  # CJK slice
        (0xAC00, 0xAD00),  # Hangul slice
        (0x1F300, 0x1F64F),  # emoji
        (0x0130, 0x0131),  # İ / ı explicitly, every sample
    ]
    rng = random.Random(11)
    rows = []
    for i in range(300):
        s = "".join(
            chr(rng.randint(*rng.choice(blocks))) for _ in range(rng.randint(0, 40))
        )
        rows.append((i, s))
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {
        r["i"]: r["lo"]
        for r in df.select("i", portable_lower(F.col("text")).alias("lo")).collect()
    }
    con = duckdb.connect()
    expr = PORTABLE_LOWER_SQL.format(col="?")
    bad = []
    for i, s in rows:
        want = con.execute(f"SELECT {expr}", [s]).fetchone()[0]
        if got[i] != want:
            bad.append((s, got[i], want))
    assert not bad, bad[:3]


def test_reverse_levenshtein_ascii_domain_bound():
    """reverse() and levenshtein() have NO portable multibyte form:
    DuckDB reverse is grapheme-cluster-aware (Spark reverses code
    points) and DuckDB levenshtein counts bytes (Spark counts code
    points) — so the registry applies them only to ASCII identifier
    columns. Pin that domain: every c_name and p_name byte is ASCII at
    the oracle SF, so the contract holds on the data it runs on."""
    con = duckdb.connect()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n_bad = con.execute(
            f"""
            SELECT (SELECT count(*) FROM '{sf}/customer.parquet'
                    WHERE c_name != regexp_replace(c_name, '[^\\x00-\\x7F]', '', 'g'))
                 + (SELECT count(*) FROM '{sf}/part.parquet'
                    WHERE p_name != regexp_replace(p_name, '[^\\x00-\\x7F]', '', 'g'))
            """
        ).fetchone()[0]
        assert n_bad == 0, f"non-ASCII identifier rows at {sf}: {n_bad}"


def test_lint_flags_reverse_and_levenshtein_over_text(spark):
    from pyspark.sql import functions as F

    from tools.plan_lint import lint_casefold

    def hits(df):
        return lint_casefold(df._jdf.queryExecution().analyzed().toJSON())

    docs = spark.createDataFrame([(1, "body", "name")], ["id", "text", "nm"])
    assert hits(docs.select(F.reverse("text")))
    assert hits(docs.select(F.levenshtein("nm", "text"))), "either argument"
    assert not hits(docs.select(F.reverse("nm")))
    assert not hits(docs.select(F.levenshtein("nm", F.lit("x"))))


def test_guarded_fold_equals_unconditional_on_corpus(spark):
    """The guarded portable_lower (contains probes routing ASCII rows
    to bare lower()) must be BIT-IDENTICAL to the unconditional
    translate-lower-translate chain — the form every oracle SQL inlines
    — on the real document corpus PLUS the unicode-clone trap rows.
    Guard soundness: translate is the identity when its search char is
    absent, and U+03A3 is the only uppercase codepoint Java lowers to
    ς, so rows without İ/Σ/ς cannot differ under bare lower()."""
    from pyspark.sql import functions as F

    from market_analyze_data_stream_processing_spark.functions.text import (
        portable_lower,
    )

    uncond = F.translate(
        F.lower(F.translate(F.col("text"), "İ", "i")), "ς", "σ"
    )
    traps = spark.createDataFrame(
        [
            ("İstanbul ΣΟΦΟΣ τέλος ς",),
            ("plain ascii body",),
            ("word-final ΤΕΛΟΣ",),
            ("ΑΒΓΣ mixed Σ",),
            ("ııİİ",),
            ("",),
            (None,),
        ],
        "text string",
    )
    corpus = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("text")
        .union(traps)
    )
    n_diff = (
        corpus.select(
            portable_lower(F.col("text")).alias("a"), uncond.alias("b")
        )
        .where(~F.col("a").eqNullSafe(F.col("b")))
        .count()
    )
    assert n_diff == 0
