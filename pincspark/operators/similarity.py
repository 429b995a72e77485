"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and IVF-partitioned approximate top-k (the scale path).

Scale notes (100 TB of vectors):
- Brute force is a broadcast of the (small) query set against a full corpus
  scan — embarrassingly parallel, no corpus shuffle; the per-query top-k is
  taken with ONE aggregation using map-side partial top-k (min_by-style
  struct ordering), not a global sort.
- IVF: k centroids are chosen deterministically from the corpus, every
  corpus vector is assigned to its nearest centroid once (narrow pass +
  broadcast of centroids), and each query probes only ``nprobe`` nearest
  cells — turning O(Q*N) into O(Q*N*nprobe/k) with the same DataFrame-only
  machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pincspark.functions.vectors import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Returns (query_id, neighbor_id, rank, score) with rank 1..k, score
    rounded to 6 dp; ties broken by neighbor id ascending (deterministic).
    Self-matches (query_id == neighbor_id) are excluded.
    """
    q = F.broadcast(queries.select(query_id, query_vec))
    corpus_spread = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, corpus_id
    )
    scored = (
        corpus_spread.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec))
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col(query_id))
        .select(
            query_id,
            "neighbor_id",
            F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6).alias("score"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "score")
    )


def ivf_assign(
    corpus: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF index build: centroids = the ``num_cells`` corpus
    vectors with the smallest ids (reproducible without RNG; swap in k-means
    centroids offline for production). Returns (centroids, assigned) where
    ``assigned`` adds a ``cell`` column via nearest-centroid cosine."""
    centroids = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(num_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid"))
    )
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, id_col
    )
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        "cell",
        # 9-dp rounding makes cell assignment portable across engines
        # (the SQL oracle replicates the index build exactly)
        F.round(cosine(F.col(vec_col), F.col("centroid")), 9).alias("cscore"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )
    return centroids, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest IVF cells per
    query. Same output shape as :func:`cosine_topk`."""
    centroids, assigned = ivf_assign(corpus, num_cells, corpus_id, corpus_vec)

    qcells = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            query_id,
            query_vec,
            "cell",
            F.round(cosine(F.col(query_vec), F.col("centroid")), 9).alias("cscore"),
        )
    )
    wq = Window.partitionBy(query_id).orderBy(F.col("cscore").desc(), F.col("cell").asc())
    probes = (
        qcells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            F.col(corpus_id).alias("neighbor_id"),
            F.round(cosine(F.col(query_vec), F.col(corpus_vec)), 6).alias("score"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "score")
    )
