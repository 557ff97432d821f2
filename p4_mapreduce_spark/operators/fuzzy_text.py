"""Fuzzy string matching and unicode/text cleaning operators.

Training-data pipelines need these between raw crawl and tokenizer:
edit-distance entity matching, unicode canonicalization (NFC — the
same visible string must dedup identically whether it arrived
precomposed or as combining sequences), and boilerplate/markup
stripping. The reference has no string surface at all beyond piping
bytes through executables (SURVEY.md §2.2, ``tests/testdata/exec/
grep_map.py:22-30``).

Scale notes:

- ``levenshtein_similar_names`` self-joins the *distinct* name set
  (dimension-sized) with an equi-key block (shared last token) before
  the quadratic distance — the classic blocking recipe: never
  all-pairs the corpus; block on a cheap key, run the expensive
  metric inside blocks only. At 100 TB the block key comes from a
  cheap signature (first char + length band, or LSH bucket).
- ``nfc_unicode_normalize`` is a vectorized Arrow-batched pandas UDF
  (str.normalize over a whole batch) — pure map, no shuffle, scales
  linearly with executors.
- ``strip_markup_boilerplate`` is JVM-side regexp_replace inside
  whole-stage codegen — zero Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

_LEV_MAX = 3


@register(
    "levenshtein_similar_names",
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name,
               string_split(p_name, ' ')[-1] AS block_key
        FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_distance
    FROM names a JOIN names b
      ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
    """,
    doc="Fuzzy entity matching: distinct part names blocked on their "
    f"last token, Levenshtein distance <= {_LEV_MAX} inside each "
    "block — the blocking pattern that keeps edit-distance matching "
    "off the all-pairs cliff (distance runs on block-mate pairs only). "
    "Both engines implement the identical Wagner-Fischer distance, so "
    "the pair set matches exactly.",
    tags=("text", "fuzzy", "join", "dedup"),
)
def levenshtein_similar_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn(
            "block_key", F.element_at(F.split("p_name", " ", -1), -1)
        )
    )
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= _LEV_MAX)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("edit_distance"),
        )
    )


# A decomposed suffix: 'cafe' + COMBINING ACUTE (U+0301). NFC fuses the
# trailing 'e' + accent into a single precomposed 'é' (U+00E9).
_NFC_SUFFIX = "café"


@register(
    "nfc_unicode_normalize",
    oracle="""
    SELECT doc_id,
           nfc_normalize(concat(substr(text, 1, 16), 'cafe', chr(769)))
               AS nfc_text,
           length(concat(substr(text, 1, 16), 'cafe', chr(769))) AS raw_chars,
           length(nfc_normalize(concat(substr(text, 1, 16), 'cafe', chr(769))))
               AS nfc_chars
    FROM documents
    """,
    doc="Unicode NFC canonicalization (vectorized pandas-UDF "
    "str.normalize): combining sequences fuse to precomposed forms so "
    "byte-level dedup/fingerprinting sees one representation — a "
    "denormalized suffix (e + U+0301) is appended to every doc to "
    "prove the fuse (char count drops by one). Oracle: DuckDB's "
    "nfc_normalize. Arrow-batched, pure map stage.",
    tags=("text", "unicode", "python", "quality"),
)
def nfc_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    docs = load(spark, sf_dir, "documents")
    raw = F.concat(F.substring("text", 1, 16), F.lit(_NFC_SUFFIX))
    return docs.select(
        "doc_id",
        nfc(raw).alias("nfc_text"),
        F.length(raw).alias("raw_chars"),
        F.length(nfc(raw)).alias("nfc_chars"),
    )


@register(
    "strip_markup_boilerplate",
    oracle=r"""
    WITH wrapped AS (
        SELECT doc_id,
               concat('<html><body><p id="', CAST(doc_id AS VARCHAR),
                      '">', substr(text, 1, 40),
                      '</p><script>var x=1;</script></body></html>') AS page
        FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(page, '<script>.*?</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g')) AS clean_text,
           length(page) AS raw_chars,
           length(trim(regexp_replace(
               regexp_replace(page, '<script>.*?</script>', ' ', 'g'),
               '<[^>]+>', ' ', 'g'))) AS clean_chars
    FROM wrapped
    """,
    doc="Boilerplate/markup stripping: script blocks then all tags "
    "removed by two JVM-side regexp_replace passes (whole-stage "
    "codegen, no Python) — the first stage of every HTML-crawl "
    "pipeline. Documents are wrapped in synthetic markup first so the "
    "strip provably removes it; clean vs raw char counts expose the "
    "boilerplate ratio. Note trim(): both engines collapse the tag "
    "residue the same way.",
    tags=("text", "quality", "regex"),
)
def strip_markup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<html><body><p id="'),
        F.col("doc_id").cast("string"),
        F.lit('">'),
        F.substring("text", 1, 40),
        F.lit("</p><script>var x=1;</script></body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(page, "<script>.*?</script>", " "),
            "<[^>]+>",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(page).alias("raw_chars"),
        F.length(clean).alias("clean_chars"),
    )
