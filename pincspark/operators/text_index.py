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
  tests/test_text_index.py). Zero-token documents keep one ``term IS
  NULL`` marker row so the sidecars derive from postings alone;
- ``<path>/dfreq``    — (term, df) document frequencies (small);
- ``<path>/stats``    — one row: (n_docs, sum_dl, n_dl, avgdl); the exact
  BIGINT sums make incremental folds bit-identical to rebuilds.

The build tokenizes the corpus exactly ONCE (plan-asserted); steady-state
maintenance is :func:`update_text_index`, which tokenizes only the new
batch and folds the sidecars — O(batch), never O(history).

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
from pincspark.operators.commits import commit_sidecar, read_sidecar
from pincspark.planhooks import record_staged_plan

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


def _postings_frame(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """The (id, term, tf, dl, term_bucket) postings frame, ONE tokenize.

    ``explode_outer`` keeps zero-token (and NULL-text) documents as a
    single ``term IS NULL`` marker row (tf=0, dl=0 or NULL), so corpus
    stats — n_docs counts EVERY document, avgdl averages the non-NULL
    dls — can later be derived from the persisted postings alone without
    a second corpus pass. Marker rows land in the NULL term_bucket
    partition; serve-time ``term IN (...)`` never matches them."""
    tok = docs.select(
        F.col(id_col),
        ws_tokens(normalize_text(F.col(text_col))).alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode_outer("__toks").alias("term"),
    )
    return (
        tok.groupBy(id_col, "term")
        .agg(
            F.sum(F.when(F.col("term").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("tf"),
            F.min("dl").alias("dl"),
        )
        .withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    )


def _write_sidecars_from_postings(
    postings: DataFrame, path: str, id_col: str
) -> None:
    """Derive and overwrite the dfreq + stats sidecars from a postings
    frame (never from the raw corpus). avgdl is an exact BIGINT sum
    divided ONCE — deterministic and fold-exact, so an incremental
    update's stats are bit-identical to a full rebuild's."""
    record_staged_plan(postings, "text_index:dfreq-source")
    commit_sidecar(
        postings.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.count(F.lit(1)).cast("bigint").alias("df")
        ),
        f"{path}/dfreq",
    )
    per_doc = postings.groupBy(id_col).agg(F.min("dl").alias("dl"))
    record_staged_plan(per_doc, "text_index:stats-source")
    commit_sidecar(
        per_doc.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
            F.count("dl").cast("bigint").alias("n_dl"),
        ).withColumn(
            "avgdl", F.col("sum_dl").cast("double") / F.col("n_dl")
        ),
        f"{path}/stats",
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Persist postings/dfreq/stats. The corpus is tokenized exactly ONCE
    (the postings write — plan-asserted in tests/test_text_index.py);
    dfreq and stats both derive from the PERSISTED postings, which carry
    dl per document and a marker row per zero-token document (see
    :func:`_postings_frame`), so neither sidecar re-reads the corpus.
    Every subsequent serve reads only the probed buckets."""
    postings = _postings_frame(docs, id_col, text_col, n_buckets)
    record_staged_plan(postings, "text_index:postings-build")
    postings.write.mode("overwrite").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )
    persisted = docs.sparkSession.read.parquet(f"{path}/postings")
    _write_sidecars_from_postings(
        persisted.select(id_col, "term", "tf", "dl"), path, id_col
    )


def update_text_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> None:
    """Incremental index maintenance — the serving steady state: fold a
    NEW crawl batch into a persisted index without re-tokenizing history.

    Work is O(batch + sidecars): the batch is tokenized once (staged, so
    the postings append and the dfreq/stats folds share it), its postings
    buckets are APPENDED to the partitioned postings table (history files
    untouched — proven by files-on-disk in tests/test_text_index.py),
    dfreq folds via a full-outer term join of the old sidecar with the
    batch's term counts, and stats folds the exact BIGINT sums. Both
    sidecars commit via the manifest-pointer protocol
    (`operators.commits` — atomic on POSIX and on object stores;
    VERDICT r15 #3), never overwriting a parquet directory that is
    still being read.

    Precondition (documented, like dedup_snapshot's): batch doc ids must
    be NEW — append-only corpus growth; screen re-crawls upstream with
    `dedup_incremental`. Under that precondition the updated index is
    bit-identical to a full rebuild over old ∪ batch (pinned in
    tests/test_text_index.py), because groupBy(id, term) over the union
    is the union of the per-batch groupBys when ids are disjoint, and the
    sidecar folds are exact integer arithmetic."""
    from pincspark.staging import stage

    spark = new_docs.sparkSession
    batch = stage(
        _postings_frame(new_docs, id_col, text_col, n_buckets),
        "text_index:update-batch",
        eager=True,
    )
    batch.write.mode("append").partitionBy("term_bucket").parquet(
        f"{path}/postings"
    )

    batch_dfreq = (
        batch.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bdf"))
    )
    old_dfreq = read_sidecar(spark, f"{path}/dfreq")
    folded_dfreq = (
        old_dfreq.join(batch_dfreq, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("bdf"), F.lit(0))
            )
            .cast("bigint")
            .alias("df"),
        )
    )
    commit_sidecar(folded_dfreq, f"{path}/dfreq")

    batch_per_doc = batch.groupBy(id_col).agg(F.min("dl").alias("dl"))
    batch_stats = batch_per_doc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        F.count("dl").cast("bigint").alias("n_dl"),
    ).collect()[0]
    old_stats = read_sidecar(spark, f"{path}/stats").collect()[0]
    n_docs = old_stats["n_docs"] + batch_stats["n_docs"]
    sum_dl = (old_stats["sum_dl"] or 0) + (batch_stats["sum_dl"] or 0)
    n_dl = old_stats["n_dl"] + batch_stats["n_dl"]
    folded = spark.createDataFrame(
        [(n_docs, sum_dl, n_dl)], "n_docs bigint, sum_dl bigint, n_dl bigint"
    ).withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_dl"))
    commit_sidecar(folded, f"{path}/stats")


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
    dfreq = read_sidecar(spark, f"{path}/dfreq").filter(
        F.col("term").isin(list(terms))
    )
    stats = read_sidecar(spark, f"{path}/stats")
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
