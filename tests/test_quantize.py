"""int8 embedding quantization (operators/similarity.py): reconstruction
error bound, zero-vector handling, narrow plan, and recall of quantized
top-k vs the exact cosine baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.similarity import (
    cosine_topk,
    quantize_embeddings,
    quantized_topk,
)
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def test_quantize_error_bound_and_range(spark):
    emb = table(spark, SF_DIR, "embeddings")
    q = quantize_embeddings(emb)
    checks = q.select(
        F.array_max(F.transform(F.col("qvec"), lambda x: F.abs(x))).alias("qmax"),
        # max |x - q * scale/127| over the vector, in units of scale
        F.array_max(
            F.zip_with(
                F.col("embedding"),
                F.col("qvec"),
                lambda x, qv: F.abs(
                    x.cast("double") - qv.cast("double") * F.col("qscale") / 127.0
                ),
            )
        ).alias("err"),
        (F.col("qscale") / 254.0 * 1.0000001).alias("bound"),
    )
    agg = checks.agg(
        F.max("qmax").alias("qmax"),
        F.max(F.col("err") - F.col("bound")).alias("worst"),
    ).collect()[0]
    assert agg["qmax"] <= 127
    # round-to-nearest halves the step: |err| <= scale/127/2 = scale/254
    assert agg["worst"] <= 0


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["qvec"] == [0, 0, 0] and rows[1]["qscale"] == 0.0
    assert rows[2]["qvec"] == [64, -127, 32]  # round(0.5*63.5)=round(31.75)=32


def test_quantize_plan_is_narrow(spark):
    emb = table(spark, SF_DIR, "embeddings")
    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization of 64-dim vectors must preserve most of the exact
    top-5 neighborhood (recall@5 >= 0.8 on the test corpus)."""
    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk(emb, queries, k=5).collect()
    quant = quantized_topk(emb, queries, k=5).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    q = {(r["query_id"], r["neighbor_id"]) for r in quant}
    assert len(e) == len(q) == 50
    assert len(e & q) / len(e) >= 0.8
