"""Persistent IVF index (operators/ann_index.py): build/load round-trip,
query identity with the transient `ivf_topk` path, and PROOF that the
cell-partitioned layout actually prunes — the serving read touches only
the probed partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.operators.ann_index import (
    build_ivf_index,
    ivf_index_topk,
    load_ivf_index,
)
from pincspark.operators.similarity import ivf_topk
from pincspark.sources.tables import table
from tests.conftest import SF_DIR


def _queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_persisted_index_matches_transient_ivf(spark, tmp_path):
    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=16)

    served = ivf_index_topk(
        spark, path, _queries(emb), k=5, nprobe=4
    ).collect()
    transient = ivf_topk(emb, _queries(emb), k=5, num_cells=16, nprobe=4).collect()
    assert sorted(map(tuple, served)) == sorted(map(tuple, transient))
    assert len(served) == 50  # 10 queries x k=5


def test_postings_scan_is_partition_pruned(spark, tmp_path):
    """The whole point of the cell-partitioned layout: a probe of a few
    cells must reach the parquet source as a PartitionFilter, reading
    only those cell directories."""
    emb = table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=16)
    _, postings = load_ivf_index(spark, path)

    pruned = postings.filter(F.col("cell").isin([3, 7]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    # and the pruned read really returns only those cells
    cells = {r["cell"] for r in pruned.select("cell").distinct().collect()}
    assert cells <= {3, 7}


def test_trained_index_round_trips(spark, tmp_path):
    """kmeans-trained centroids persist and load bit-identically."""
    emb = table(spark, SF_DIR, "embeddings").limit(200)
    path = str(tmp_path / "ivf_trained")
    build_ivf_index(emb, path, num_cells=8, kmeans_iters=2)
    centroids, postings = load_ivf_index(spark, path)
    assert centroids.count() == 8
    # every corpus vector landed in exactly one cell
    assert postings.count() == 200
    assert postings.select("vec_id").distinct().count() == 200
