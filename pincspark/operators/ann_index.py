"""Persistent IVF index: build once, serve many queries — the production
shape of ANN at 100 TB.

The in-query IVF path (`similarity.ivf_topk`) rebuilds the index inside
every query, which is right for the oracle-gated catalog but wrong for a
serving workload: at corpus scale the index build (centroid training +
full-corpus assignment) is hours of work amortized across millions of
queries. This module persists the index as two parquet datasets:

- ``<path>/centroids`` — the k (cell, centroid) rows (tiny, broadcast at
  query time);
- ``<path>/postings``  — the corpus (id, vector, cell), WRITTEN
  PARTITIONED BY ``cell``: a query probing ``nprobe`` of ``num_cells``
  cells pushes ``cell IN (...)`` into the scan as a PARTITION filter and
  physically reads only nprobe/num_cells of the index
  (`test_ann_index.py` asserts the pruning in the plan).

Query-time identity with the transient path is pinned: loading the index
and probing it returns exactly `ivf_topk`'s rows for the same centroid
seed, so callers can switch freely between the forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pincspark.functions.vectors import cosine
from pincspark.operators.similarity import _two_phase_topk, ivf_assign, kmeans_centroids


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    num_cells: int = 16,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and persist the IVF index. ``kmeans_iters=0`` uses the
    deterministic smallest-id seeding (reproducible, oracle-portable);
    ``> 0`` trains spherical k-means for the production-quality cells."""
    centroids = (
        kmeans_centroids(corpus, num_cells, kmeans_iters, id_col, vec_col)
        if kmeans_iters > 0
        else None
    )
    centroids, assigned = ivf_assign(
        corpus, num_cells, id_col, vec_col, centroids=centroids
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    # partitioned by cell: probe-time cell predicates become partition
    # pruning, the scan reads only the probed fraction of the index
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/postings"
    )


def update_ivf_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance — the vector twin of the q107 text-
    index fold (VERDICT r13 #4): fold a NEW crawl batch into a persisted
    IVF index in O(batch), never rescanning or retraining on history.

    The centroids are loaded and FROZEN (the standard serving practice:
    assignment must stay consistent with every vector already in the
    postings; retraining is a scheduled rebuild, not an update), the new
    vectors are assigned to their nearest existing cell by the exact
    `ivf_assign` arithmetic, and the rows are APPENDED to the cell
    partitions — parquet append writes new files inside the affected
    ``cell=`` directories and never rewrites a historical file
    (pinned by path+mtime in tests/test_ann_index.py). Updated-index
    serving is row-identical to a full re-assignment over old ∪ batch
    against the same frozen centroids (q112's oracle replays exactly
    that).

    100 TB: one broadcast join (batch x centroids) + one narrow write of
    batch-sized data; the existing index is never read."""
    centroids = spark.read.parquet(f"{path}/centroids")
    _, assigned = ivf_assign(new_vectors, id_col=id_col, vec_col=vec_col,
                             centroids=centroids)
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/postings")


def load_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(centroids, postings). Postings keep their ``cell`` partition column."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/postings"),
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve approximate top-k from a persisted index: broadcast the
    centroids to pick each query's ``nprobe`` cells, push the probed cell
    set into the postings scan as a partition filter, score only those
    postings, two-phase top-k. Output shape matches `cosine_topk`."""
    centroids, postings = load_ivf_index(spark, path)

    qcells = queries.crossJoin(F.broadcast(centroids)).select(
        query_id,
        query_vec,
        "cell",
        F.round(cosine(F.col(query_vec), F.col("centroid")), 9).alias("cscore"),
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probes = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cell")
    )
    # the probed CELL SET is tiny (<= nprobe * n_queries distinct values):
    # collect it and push an IN-list predicate so the parquet source
    # prunes partitions — the broadcast-join route alone would still scan
    # every cell file at split planning time
    cells = sorted({int(r["cell"]) for r in probes.select("cell").distinct().collect()})
    pruned = postings.filter(F.col("cell").isin(cells))

    scored = (
        pruned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col(query_id))
        .select(
            query_id,
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col(query_vec), F.col(vec_col)), 6).alias("score"),
        )
    )
    return _two_phase_topk(scored, query_id, k)
