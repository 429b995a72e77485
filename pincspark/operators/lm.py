"""N-gram language-model perplexity scoring — the CCNet-style corpus
quality signal (Wenzek et al. 2020: train a LM on trusted target-domain
text, score every candidate document; low perplexity ~ in-domain fluent
text, high perplexity ~ noise). The reference engine has no LM scorer;
this extends the training-data pipeline family (quality.py, dedup.py)
with the standard model-based filter, re-expressed as pure DataFrame
aggregations so it holds at 100 TB.

Model: bigram LM with add-``alpha`` smoothing, trained on the documents
matching ``train_filter`` and scored over ALL documents:

    P(w2 | w1) = (c_train(w1 w2) + alpha) / (c_train(w1 .) + alpha * V)

with ``c_train(w1 .)`` the count of w1 as a *context* (sum of bigram
counts starting at w1) and ``V`` the trained vocabulary size (distinct
successor types). Unseen contexts/bigrams degrade smoothly to the
``alpha / (alpha * V) = 1/V`` floor, so out-of-domain documents score
finite-but-high cross-entropy instead of -inf — exactly the behavior a
filtering pipeline needs.

Spark-first shape (100 TB):
- tokens explode ONCE into per-doc bigram counts (one shuffle keyed on
  (doc, w1, w2); map-side partial aggregation collapses repeated spans
  before the exchange);
- the global model is RE-aggregated from those per-doc counts (shuffle
  keyed (w1, w2) over the much smaller distinct-bigram table — the raw
  token stream never shuffles twice);
- context counts fold out of the bigram table (vocab-sized shuffle), and
  V is a 1-row aggregate broadcast back via crossJoin — never collected
  into the plan;
- scoring is two equi-joins on the same (w1, w2)/(w1) keys the model
  tables are already partitioned by, then one groupBy(doc). Hot bigrams
  ("the the") are read-side lookups here, not groupBy skew: the join's
  build side has ONE row per bigram regardless of frequency.
- No UDFs anywhere; every expression is whole-stage codegen.

Float discipline (q59 lesson, q48 precedent): the only libm call is
``ln`` of a deterministic rational; per-doc sums are rounded to 6 dp so
addition order and last-ulp ln differences across engines cannot reach
the hashed output. ``perplexity = exp(H)`` amplifies any residual by the
perplexity itself, so the gated query projects the entropy, not exp(H).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pincspark.functions.text import ws_tokens


def _bigrams(toks: Column) -> Column:
    """Adjacent token pairs as structs (w1, w2); [] for <2 tokens."""
    n = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def doc_bigram_counts(
    df: DataFrame, id_col: str, text_col: str, train_filter: Column
) -> DataFrame:
    """Per-document bigram counts: (id, is_train, w1, w2, cnt).

    One Generate + one hash aggregate; the exchange carries distinct
    (doc, bigram) keys, already partially combined map-side.
    """
    return (
        df.select(
            F.col(id_col),
            train_filter.alias("is_train"),
            F.explode(_bigrams(ws_tokens(F.col(text_col)))).alias("bg"),
        )
        .groupBy(id_col, "is_train", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter: Column | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Score every document (with >= 1 bigram) under a bigram LM trained
    on the ``train_filter`` slice: (id, n_bigrams, oov_bigrams,
    cross_entropy, perplexity). ``cross_entropy`` is mean negative
    ln-probability per bigram token (nats), rounded to 6 dp;
    ``perplexity = exp(H)`` likewise rounded (derived — exclude it from
    hash-gated projections, see module docstring). ``oov_bigrams`` counts
    scored bigram tokens never seen in training.

    ``train_filter`` defaults to all documents (self-scoring), in which
    case oov_bigrams is 0 everywhere.
    """
    if train_filter is None:
        train_filter = F.lit(True)
    pdc = doc_bigram_counts(df, id_col, text_col, train_filter)

    model = (
        pdc.filter(F.col("is_train"))
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("cb"))
    )
    ctx = model.groupBy("w1").agg(F.sum("cb").alias("cw1"))
    vstats = model.select(F.count_distinct("w2").alias("v"))

    a = F.lit(float(alpha))
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + a)
        / (F.coalesce(F.col("cw1"), F.lit(0)) + a * F.col("v"))
    )
    return (
        pdc.join(model, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .crossJoin(F.broadcast(vstats))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.when(F.col("cb").isNull(), F.col("cnt")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("oov_bigrams"),
            F.round(-F.sum(F.col("cnt") * logp) / F.sum("cnt"), 6).alias(
                "cross_entropy"
            ),
            F.round(F.exp(-F.sum(F.col("cnt") * logp) / F.sum("cnt")), 6).alias(
                "perplexity"
            ),
        )
    )
