"""Persistent inverted text index: build once, serve many BM25 queries —
the lexical twin of the IVF serving path (`ann_index.py`).

The transient `search.bm25_scores` re-tokenizes the corpus inside every
query — right for the oracle-gated catalog, wrong for a serving workload:
at 100 TB the tokenize + tf/df aggregation is the expensive pass, amortized
across millions of queries in production. This module persists the index as
three parquet datasets:

- ``<path>/postings`` — (id, term, tf, dl), WRITTEN PARTITIONED BY
  ``term_bucket`` (md5 of the term mod ``n_buckets``): a query for a
  handful of terms pushes ``term_bucket IN (...)`` into the scan as a
  PARTITION filter and physically reads only its terms' buckets, never the
  corpus-wide posting table (pruning plan-asserted in
  tests/test_text_index.py);
- ``<path>/dfreq``    — (term, df) document frequencies (small);
- ``<path>/stats``    — one row: (n_docs, avgdl).

Serve-time scoring is the exact `bm25_scores` formula (same constant
folding, same 6-dp round), and served == transient row identity is pinned
in tests/test_text_index.py — callers switch freely between the forms.

Scale: the build pays the tokenize + two keyed aggs ONCE; a serve touches
len(terms) broadcast-joined dfreq rows, one broadcast stats row, and the
probed buckets' postings only. df (term frequency in documents) for a term
missing from the index is simply absent — matching the transient path,
which only scores terms that occur.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pincspark.functions.text import normalize_text, ws_tokens

_BUCKET_SALT = "txtidx"


def term_bucket_col(term: F.Column, n_buckets: int) -> F.Column:
    """Build-side bucket: first 8 md5 hex chars of 'txtidx:term' mod
    n_buckets — portable arithmetic so the serve side can recompute it
    anywhere (including driver-side Python, see :func:`term_bucket_py`)."""
    key = F.concat(F.lit(f"{_BUCKET_SALT}:"), term)
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    ).cast("int")


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`term_bucket_col` (byte-identical md5)."""
    h = hashlib.md5(f"{_BUCKET_SALT}:{term}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Persist postings/dfreq/stats. The corpus tokenization is paid here,
    at write time (the postings write and the stats aggregate each plan
    the tokenizer — on a real cluster, stage the token projection or point
    both at a materialized copy); every subsequent serve reads only the
    probed buckets."""
    tok = docs.select(
        F.col(id_col),
        ws_tokens(normalize_text(F.col(text_col))).alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    postings = (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"), F.min("dl").alias("dl"))
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    # df derives from the PERSISTED postings (one scan of the already-
    # aggregated table, not a second corpus pass)
    spark = docs.sparkSession
    persisted = spark.read.parquet(f"{path}/postings")
    persisted.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    ).write.mode("overwrite").parquet(f"{path}/dfreq")
    docs.select(
        F.size(ws_tokens(normalize_text(F.col(text_col)))).alias("__dl")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg("__dl").alias("avgdl"),
    ).write.mode("overwrite").parquet(f"{path}/stats")


def search_text_index(
    spark: SparkSession,
    path: str,
    terms: Sequence[str],
    id_col: str = "doc_id",
    n_buckets: int = 32,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 scores for ``terms`` served from the persisted index:
    (id, n_terms_matched, score rounded to 6 dp) — row-identical to
    `search.bm25_scores` on the same corpus/terms. The probed buckets are
    computed driver-side and pushed as a partition filter."""
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(list(terms)))
    )
    dfreq = spark.read.parquet(f"{path}/dfreq").filter(
        F.col("term").isin(list(terms))
    )
    stats = spark.read.parquet(f"{path}/stats")
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            # EXACT float-op nesting of search.bm25_scores' term_score —
            # idf * (A / B), not (idf * A) / B — so served == transient is
            # bit-identical, not merely close
            "__s",
            F.col("__idf")
            * (
                F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
        F.round(F.sum("__s"), 6).alias("score"),
    )
