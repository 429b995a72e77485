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
from pincspark.staging import stage


def _bigrams(toks: Column) -> Column:
    """Adjacent token pairs as structs (w1, w2); [] for <2 tokens."""
    n = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def _bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic feature-hash bucket: 32-bit md5 prefix mod n_buckets.
    Identical on the DuckDB side as
    ``('0x' || substring(md5(s),1,8))::BIGINT % n`` (the dedup.py shingle
    idiom, driver-proven hash-identical across engines)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % F.lit(
        n_buckets
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_filter: Column | None = None,
    n_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): features are hashed
    word unigrams + bigrams in ``n_buckets`` buckets; each document's
    log importance weight is its bucket-count vector scored under the
    target-vs-source unigram bag-of-hashed-ngrams ratio

        log w(x) = sum_b n_x[b] * (ln p_target[b] - ln p_source[b])

    with add-``alpha`` smoothed bucket probabilities. High log-weight
    documents look like the target slice; resampling by these weights is
    the paper's selection step (see ``sampling.py`` for the
    deterministic-hash resampler to compose with).

    Returns (id, n_feats, log_weight): n_feats = total hashed features
    (exact BIGINT), log_weight rounded to 6 dp (sum of ln of
    deterministic rationals — the q48/q67 float discipline).

    Scale shape mirrors ngram_lm_perplexity: one explode into per-doc
    bucket counts (shuffle keyed (doc, bucket), map-side combined), the
    two model vectors re-aggregated from that table (bucket-keyed shuffle
    over <= n_buckets * docs distinct rows), totals as a 1-row broadcast,
    scoring as one equi-join on bucket + one groupBy(doc). The model is
    n_buckets rows — broadcastable by the planner at any corpus size.
    """
    if target_filter is None:
        target_filter = F.lit(True)
    # r14 (the q91 lesson, measured): the explode + per-feature md5
    # bucket hash is this operator's heaviest compute and sits BELOW the
    # first exchange — on a single-split documents table it all ran on
    # one task. Conditional spread (no-op on a well-split corpus).
    from pincspark.operators.dedup import _spread

    df = _spread(df, id_col)
    toks = ws_tokens(F.col(text_col))
    feats = F.concat(
        toks,
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - F.lit(1), F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - F.lit(1), F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    # Staged once for the same four-consumer diamond as
    # ngram_lm_perplexity (see the comment there).
    pdc = (
        df.select(
            F.col(id_col),
            target_filter.alias("is_target"),
            F.explode(feats).alias("f"),
        )
        .withColumn("b", _bucket(F.col("f"), n_buckets))
        .groupBy(id_col, "is_target", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pdc = stage(pdc, "dsir:bucket_counts", eager=False)
    tgt = (
        pdc.filter(F.col("is_target"))
        .groupBy("b")
        .agg(F.sum("cnt").alias("ct"))
    )
    src = pdc.groupBy("b").agg(F.sum("cnt").alias("cs"))
    totals = pdc.select(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "tot_t"
        ),
        F.sum("cnt").alias("tot_s"),
    )
    a = F.lit(float(alpha))
    nb = F.lit(float(n_buckets))
    logratio = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + a) / (F.col("tot_t") + a * nb)
    ) - F.log((F.col("cs") + a) / (F.col("tot_s") + a * nb))
    return (
        pdc.join(tgt, ["b"], "left")
        .join(src, ["b"])
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_feats"),
            F.round(F.sum(F.col("cnt") * logratio), 6).alias("log_weight"),
        )
    )


def doc_bigram_counts(
    df: DataFrame, id_col: str, text_col: str, train_filter: Column
) -> DataFrame:
    """Per-document bigram counts: (id, is_train, w1, w2, cnt).

    One Generate + one hash aggregate; the exchange carries distinct
    (doc, bigram) keys, already partially combined map-side. Conditional
    spread first (r14): the bigram explode + map-side combine is the
    heavy front and must not run on one task when the corpus arrives as
    a single split.
    """
    from pincspark.operators.dedup import _spread

    df = _spread(df, id_col)
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
    # Stage the per-doc count table ONCE: four consumers (model, contexts,
    # vocab size, scoring join) would otherwise each re-run the corpus
    # scan + tokenize + explode + aggregate — Catalyst specializes the
    # branches (the is_train filter pushes below the agg on the model
    # side), so exchange reuse cannot collapse them. Same staging policy
    # as q53/q54's shingle arrays; at cluster scale swap localCheckpoint
    # for checkpoint() (reliable storage).
    pdc = stage(
        doc_bigram_counts(df, id_col, text_col, train_filter),
        "lm:bigram_counts",
        eager=False,
    )

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
