"""Build a unicode-stress clone of a testdata SF directory.

The generated documents corpus is ASCII; every text operator (shingles,
MinHash/SimHash, tokenization, lang-ID, quality gates, BPE-ish
pretokenization, redaction, chunking) therefore only ever sees
single-byte codepoints in the driver's gate. But the two engines'
string kernels differ most exactly where multi-byte text lives: Java's
``UTF8String``/regex vs DuckDB's UTF-8 kernels disagree-candidates
include case mapping of Turkish İ (U+0130) and German ẞ, codepoint-vs-
byte length accounting, ``\\w``/``[a-z]`` classes over fullwidth and
mathematical-alphanumeric letters, and substring/shingle boundaries
through surrogate-pair emoji and ZWJ sequences. A 100 TB training
corpus is NOT ASCII, so the registry must be proven identical on both
engines over exactly this text.

Injected rows (fresh ids ≥ 910001; all other tables byte-identical):

- CJK with no spaces (whitespace tokenizer sees ONE long token; char
  shingles cross 3-byte codepoints);
- emoji: surrogate-pair astral codepoints, ZWJ family sequence, flag
  (regional-indicator pair), skin-tone modifier;
- combining marks: the SAME visual word precomposed (NFC) and
  decomposed (NFD) — distinct codepoints, so exact-dedup must NOT
  merge them and both engines must agree on that;
- Turkish İ/ı and dotless-I casing traps; German ß/ẞ; Greek final ς;
- RTL Arabic/Hebrew with embedded LTR digits;
- fullwidth Latin and mathematical-alphanumeric (astral "letters" that
  are NOT ``\\w`` in either engine's ASCII-class default);
- mixed-script spoof (Cyrillic а/е inside a Latin word — distinct
  bytes, same glyphs: a dedup trap);
- a near-duplicate pair differing by ONE emoji (MinHash/Jaccard on
  multibyte shingles);
- an exact-duplicate pair of a CJK/emoji text (multibyte exact dedup).

n_chars is computed with DuckDB ``length()`` (codepoints) at build
time so the metadata column stays consistent with the generator's
convention.

Usage: python tools/unicode_clone.py [src_sf_dir] [dst_dir]
       python tools/verify_local.py <dst_dir>
"""

from __future__ import annotations

import glob
import os
import shutil
import sys

import duckdb

# (doc_id, text, lang, source) — n_chars derived at build time.
ROWS = [
    (910001, "東京の市場データは高速で処理される必要がある株価の変動を追跡する", "ja", "unicode"),
    (910002, "市场数据流处理引擎必须正确处理中文文本没有空格的长句子测试", "zh", "unicode"),
    (910003, "rocket 🚀 to the moon 🌕 and back 🚀🚀 profit 📈", "en", "unicode"),
    (910004, "family 👨‍👩‍👧‍👦 flag 🇫🇷 wave 👋🏽 done", "en", "unicode"),
    # same visual word, NFC vs NFD (é precomposed vs e + U+0301)
    (910005, "café résumé naïve déjà vu encore", "fr", "unicode"),
    (910006, "cafe\u0301 re\u0301sume\u0301 nai\u0308ve de\u0301ja\u0300 vu encore", "fr", "unicode"),  # NFD twin of 910005
    (910007, "İstanbul ışık ISTANBUL istanbul IŞIK", "tr", "unicode"),
    (910008, "straße STRASSE Straẞe groß GROẞ", "de", "unicode"),
    (910009, "ο σοφός λόγος τέλος ΣΟΦΟΣ", "el", "unicode"),
    (910010, "الأسعار ارتفعت 42 بالمئة اليوم", "ar", "unicode"),
    (910011, "המחיר עלה 123 נקודות היום", "he", "unicode"),
    (910012, "Ｈｅｌｌｏ Ｗｏｒｌｄ ｔｅｓｔ", "en", "unicode"),
    (910013, "\U0001d57f\U0001d586\U0001d587\U0001d58d\U0001d58a normal words after astral letters", "en", "unicode"),
    # Cyrillic а (U+0430) and е (U+0435) inside Latin words
    (910014, "dаta strеam processing looks identical but is not", "en", "unicode"),
    (910015, "the quick brown fox jumps over the lazy dog near the river bank", "en", "unicode"),
    (910016, "the quick brown fox jumps over the lazy dog near the river bank 🦊", "en", "unicode"),
    (910017, "重複したテキスト 🚀 exact duplicate pair across engines", "ja", "unicode"),
    (910018, "重複したテキスト 🚀 exact duplicate pair across engines", "ja", "unicode"),
]


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(p) != "documents.parquet":
            shutil.copy(p, dst)
    con = duckdb.connect()
    values = ",\n    ".join(
        "(%d, %s, '%s', '%s')" % (i, _sql_str(t), lang, srcname)
        for i, t, lang, srcname in ROWS
    )
    # columns listed explicitly in BOTH branches (not SELECT *): DuckDB
    # binds UNION ALL positionally, so a future reorder of the source
    # parquet schema would silently misalign columns (e.g. text/lang
    # swap) instead of erroring — round-11 advisory
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars
  FROM '{src}/documents.parquet'
  UNION ALL
  SELECT doc_id, text, lang, source, length(text) AS n_chars
  FROM (VALUES
    {values}
  ) v(doc_id, text, lang, source)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    n, mb = con.execute(
        f"SELECT count(*), max(length(text)) FROM '{dst}/documents.parquet'"
    ).fetchone()
    print(f"built {dst}: {n} documents, max n_chars {mb}")


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfu"
    build(src, dst)
