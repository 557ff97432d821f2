"""Training-data pipeline operators: chunking, redaction, split assignment.

The ops between "raw corpus" and "training batches" that a 100 TB text
pipeline runs after dedup/quality filtering:

- **chunking**: fixed-size token windows with overlap (context-length
  packing). Pure array arithmetic per row — no shuffle, no Python.
- **redaction**: pattern-based scrubbing (PII-ish classes) via RE2-
  compatible regexes that behave identically in both engines.
- **split assignment**: content-hash buckets → train/val/test. Hash-mod
  (not random): reproducible across runs, retries, and engines, and
  documents never migrate between splits when the corpus grows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from p4_mapreduce_spark.registry import register
from p4_mapreduce_spark.sources.tables import load

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap


@register(
    "text_chunking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           array_to_string(t[s : s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text,
           CAST(least({CHUNK_TOKENS}, len(t) - s + 1) AS INTEGER) AS n_tokens
    FROM toks, unnest(generate_series(1, greatest(len(t), 1), {CHUNK_STRIDE})) AS g(s)
    WHERE len(t) >= s
    """,
    doc=f"Context-window chunking: {CHUNK_TOKENS}-token chunks with "
    f"{CHUNK_TOKENS - CHUNK_STRIDE}-token overlap (stride {CHUNK_STRIDE}) "
    "— per-row array slicing, zero shuffle, the packing step before "
    "tokenizer/batch assembly.",
    tags=("text", "pipeline"),
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ", -1).alias("t"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    exploded = toks.select(
        "doc_id", "t", F.explode(starts).alias("s")
    ).where(F.size("t") >= F.col("s"))
    return exploded.select(
        "doc_id",
        ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.array_join(F.slice("t", F.col("s"), CHUNK_TOKENS), " ").alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("s") + 1)
        .cast("int")
        .alias("n_tokens"),
    )


@register(
    "pii_redaction",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   text || ' contact id ' || CAST(doc_id * 7919 AS VARCHAR)
                        || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com',
                   '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(
               text || ' contact id ' || CAST(doc_id * 7919 AS VARCHAR)
                    || ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com',
               '[0-9]+')) AS INTEGER) AS n_number_runs
    FROM documents
    """,
    doc="PII-style redaction: email then digit-run scrubbing with "
    "RE2-compatible patterns (the corpus has no PII, so a deterministic "
    "synthetic suffix exercises both classes).",
    tags=("text", "pipeline"),
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact id "),
        (F.col("doc_id") * 7919).cast("string"),
        F.lit(" mail user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    emails_gone = F.regexp_replace(enriched, r"[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_replace(emails_gone, r"[0-9]+", "<NUM>").alias("redacted"),
        F.size(F.regexp_extract_all(enriched, F.lit(r"[0-9]+"), 0)).alias(
            "n_number_runs"
        ),
    )


@register(
    "train_val_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id,
               CASE WHEN strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 13
                    THEN 'train'
                    WHEN strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) <= 15
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, count(*) AS n_docs,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM assigned GROUP BY split
    """,
    doc="Deterministic train/val/test assignment by content-hash bucket "
    "(~81/13/6): stable across runs and corpus growth, unlike "
    "randomSplit. Output: per-split counts.",
    tags=("pipeline", "sampling"),
)
def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    nibble = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    )
    split = (
        F.when(nibble <= 13, "train").when(nibble <= 15, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )
