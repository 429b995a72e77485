"""Bigram-LM perplexity operator: semantics pinned on a planted corpus
with hand-computed probabilities (train/score split, add-alpha smoothing,
OOV floor), plus structural invariants (self-trained corpus has zero OOV,
short docs drop out)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pincspark.operators.lm import ngram_lm_perplexity


@pytest.fixture(scope="module")
def planted(spark):
    # Train slice: two docs, bigram counts:
    #   "a b a b"   -> (a,b) x2, (b,a) x1
    #   "a b c"     -> (a,b), (b,c)
    # Model: cb(a,b)=3 cb(b,a)=1 cb(b,c)=1; cw1(a)=3 cw1(b)=2; V={a,b,c}=3
    # Score-only doc "c d" -> (c,d): unseen context AND bigram.
    rows = [
        (1, "a b a b", True),
        (2, "a b c", True),
        (3, "c d", False),
        (4, "x", False),  # < 2 tokens: no bigrams, must drop out
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, train boolean")


def test_planted_probabilities(planted):
    out = {
        r["doc_id"]: r
        for r in ngram_lm_perplexity(
            planted, "doc_id", "text", train_filter=F.col("train"), alpha=0.5
        ).collect()
    }
    assert set(out) == {1, 2, 3}

    a = 0.5
    p_ab = (3 + a) / (3 + a * 3)  # cb=3, cw1(a)=3
    p_ba = (1 + a) / (2 + a * 3)  # cb=1, cw1(b)=2
    p_bc = (1 + a) / (2 + a * 3)
    p_oov = (0 + a) / (0 + a * 3)  # unseen context -> 1/V floor

    h1 = -(2 * math.log(p_ab) + 1 * math.log(p_ba)) / 3
    h2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    h3 = -math.log(p_oov)

    assert out[1]["n_bigrams"] == 3 and out[1]["oov_bigrams"] == 0
    assert out[2]["n_bigrams"] == 2 and out[2]["oov_bigrams"] == 0
    assert out[3]["n_bigrams"] == 1 and out[3]["oov_bigrams"] == 1
    for doc, h in ((1, h1), (2, h2), (3, h3)):
        assert out[doc]["cross_entropy"] == pytest.approx(round(h, 6), abs=1e-6)
        assert out[doc]["perplexity"] == pytest.approx(round(math.exp(h), 6), abs=1e-5)


def test_self_trained_has_no_oov(planted):
    out = ngram_lm_perplexity(planted, "doc_id", "text", alpha=0.5)
    rows = out.collect()
    assert len(rows) == 3  # doc 4 still has no bigrams
    assert all(r["oov_bigrams"] == 0 for r in rows)
    # every scored bigram was trained on, so every P > 1/V and H < ln(V):
    v = 4.0  # vocab of successors {b, a, c, d}
    assert all(r["cross_entropy"] < math.log(v) for r in rows)


def test_dsir_self_target_is_exactly_zero(planted):
    """With target == source the bucket ratio is 1 everywhere, so every
    document's log importance weight is exactly 0 — an algebraic identity
    that holds bit-for-bit (the two ln calls see identical arguments)."""
    from pincspark.operators.lm import dsir_log_weights

    rows = dsir_log_weights(planted, "doc_id", "text").collect()
    assert len(rows) == 4  # every doc has >= 1 unigram feature
    assert all(r["log_weight"] == 0.0 for r in rows)


def test_dsir_separates_target_from_off_target(spark):
    from pincspark.operators.lm import dsir_log_weights

    rows = [
        (1, "a b a b c", True),
        (2, "a c b a", True),
        (3, "x y z x y", False),  # disjoint vocabulary
        (4, "b a c a", False),    # target-like vocabulary, off-target slice
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            df, "doc_id", "text", target_filter=F.col("tgt"), n_buckets=64
        ).collect()
    }
    # target-vocabulary docs score strictly above the disjoint-vocab doc,
    # including doc 4 which shares the target's vocabulary but not its slice
    assert min(out[1], out[2], out[4]) > out[3]
    assert out[3] < 0.0


def test_dsir_n_feats_counts_unigrams_plus_bigrams(planted):
    from pincspark.operators.lm import dsir_log_weights

    out = {
        r["doc_id"]: r["n_feats"]
        for r in dsir_log_weights(planted, "doc_id", "text").collect()
    }
    # "a b a b" -> 4 unigrams + 3 bigrams; "x" -> 1 unigram + 0 bigrams
    assert out[1] == 7 and out[2] == 5 and out[3] == 3 and out[4] == 1


def test_in_domain_scores_below_out_of_domain(planted):
    out = {
        r["doc_id"]: r["cross_entropy"]
        for r in ngram_lm_perplexity(
            planted, "doc_id", "text", train_filter=F.col("train")
        ).collect()
    }
    assert out[1] < out[3] and out[2] < out[3]
