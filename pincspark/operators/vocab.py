"""Vocabulary / token-frequency builder for tokenizer training: the
corpus-wide (term frequency, document frequency) sweep over word n-grams.

With ``n=1`` this is the unigram vocab census; with ``n=2`` it is exactly
the pair-count step of one BPE merge iteration, run corpus-wide.

Scale shape (100 TB): one explode, then TWO keyed aggregations —
(doc, gram) first so document frequency is an exact count(1) (never a
count-distinct expand), then (gram). Both shuffles are fine-grained keys
with map-side partial aggregation. The global top-k compiles to
TakeOrderedAndProject (per-partition top-k, merged on the driver) — no
full sort of the vocabulary; the final rank window runs over k rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pincspark.functions.text import ws_tokens
from pincspark.operators.dedup import ngram_array


def vocab_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    k: int = 100,
) -> DataFrame:
    """Top-``k`` lowercased word ``n``-grams by total count: (token, tf,
    df, token_id). Ordering and ids are fully deterministic: tf desc,
    df desc, token asc."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    grams = df.select(
        F.col(id_col).alias("__id"), F.explode(ngram_array(toks, n)).alias("token")
    )
    per_doc = grams.groupBy("__id", "token").agg(F.count(F.lit(1)).alias("c"))
    vocab = per_doc.groupBy("token").agg(
        F.sum("c").cast("bigint").alias("tf"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    order = (F.desc("tf"), F.desc("df"), F.asc("token"))
    top = vocab.orderBy(*order).limit(k)
    return top.withColumn(
        "token_id", F.row_number().over(Window.orderBy(*order)).cast("int")
    )
