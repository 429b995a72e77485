"""Corpus search scoring: BM25 (Okapi) ranking of documents for a term
query — the lexical-retrieval counterpart of the embedding top-k operators
(similarity.py), and the standard quality signal a training pipeline uses
for query-targeted corpus filtering.

Spark-first shape (100 TB):
- tokens explode once, filtered to the query's terms FIRST (a tiny IN
  list, pushed into the same codegen stage as the tokenizer) — the corpus
  never materializes a full posting table for ranking;
- tf = one groupBy (doc, term); df = one groupBy (term) over that — both
  tiny because only query terms survive;
- corpus stats (N, avgdl) are one scalar aggregate broadcast-joined back
  (never .collect()'d into the plan);
- idf is joined by term (a few rows — broadcast), the final score is one
  groupBy(doc) sum.
Every stage is whole-stage-codegen'd; no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pincspark.functions.text import normalize_text, ws_tokens


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing >= 1 query term:
    (id, n_terms_matched, score), score rounded to 6 dp.

    score = sum over matched terms of
      ln(1 + (N - df + 0.5) / (df + 0.5)) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

    with N = corpus size, dl = doc token count, avgdl = mean dl, df = docs
    containing the term. The formula is kept in exactly this nesting on
    the DuckDB oracle side; the per-doc sum spans at most len(terms)
    doubles, so 6-dp rounding absorbs any addition-order difference.
    """
    # Filter the token ARRAY down to query terms BEFORE exploding: the old
    # form generated every token row (~dl per doc) and discarded non-query
    # terms after the Generate; the matched array is at most a handful of
    # entries, so the Generate's input shrinks by ~dl per doc. At sf0.1
    # both forms time the same (the corpus fits cache and the agg
    # dominates) — the shrink matters when dl x N is the 100-TB token
    # stream. Corpus stats aggregate the SAME projection's dl instead of
    # re-tokenizing the corpus, removing one full normalize+split pass.
    # r14 (the q91/q67 lesson, measured): the normalize+tokenize front is
    # this scorer's heaviest compute, has TWO consumers (matched rows +
    # the corpus-stats aggregate), and sat on the raw scan — a
    # single-split corpus ran it twice on one task. Conditional spread
    # (no-op on a well-split table); value-safe under any fold order
    # because dl is integer-valued (float64 sums of ints are exact).
    from pincspark.operators.dedup import _spread

    tok = _spread(df, id_col).select(
        F.col(id_col),
        ws_tokens(normalize_text(F.col(text_col))).alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.filter("__toks", lambda t: t.isin(*terms)).alias("__m"),
    )
    matched = tok.select(
        F.col(id_col), "dl", F.explode("__m").alias("term")
    )
    tf = matched.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tok.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", term_score)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two top-K retrieval lists (the standard
    hybrid lexical+vector combiner): fused = 1/(c + rank_a) + 1/(c + rank_b),
    a document absent from one list contributes nothing for it, output is
    the fused top-``k`` with ties broken by id.

    Scale shape: the inputs are already top-K lists (each produced by a
    two-phase top-k upstream — never a global sort of the full corpus),
    so the fusion join, window, and limit all run on 2*K rows per query.
    """
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("__ra"))
    b = ranked_b.select(F.col(id_col), F.col(rank_col).alias("__rb"))
    fused = (
        a.join(b, id_col, "full_outer")
        .select(
            id_col,
            F.col("__ra").cast("int").alias("lex_rank"),
            F.col("__rb").cast("int").alias("vec_rank"),
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("__ra")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("__rb")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    # Bounded by construction: the full-outer fuse of two top-K lists has
    # at most 2*K rows, so this global window is a final stage over a
    # bounded result — same acknowledgment pattern as the ANN nested-loop
    # allow-list (VERDICT r5 #6). WindowExec's single-partition WARN is
    # suppressed for exactly this reason in session.get_spark.
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= k)
    )
