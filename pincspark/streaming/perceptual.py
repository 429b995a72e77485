"""Streaming perceptual quarantine — the live form of q115 (VERDICT r14
#6): a media ingest stream folds each micro-batch into the persisted
fingerprint store (`operators/fingerprint_index.py`), flags
batch-vs-history and batch-vs-batch near-dups, and routes a REASON-CODED
verdict row per media item to a quarantine sink — the q110 operational
pattern applied to media.

Verdicts:

- ``near_dup_history`` — perceptually duplicates an item already in the
  store (re-crawl, re-encode, rescale, gain change): the row a curation
  pipeline drops;
- ``near_dup_batch``  — duplicates another item of the SAME batch (keep
  one, drop the rest — ``matched_id`` gives the deterministic partner);
- ``no_fingerprint``  — decodable but unhashable (e.g. an empty clip,
  ADVICE r14 #1): visible, never silently dropped;
- ``unique``          — folds into history, serves as history for every
  later batch.

Exactly-once (kill-and-resume, pinned in tests/test_streaming.py):
verdicts write to a parquet sink PARTITIONED BY batch with dynamic
partition overwrite, so a replayed micro-batch overwrites its own
verdicts instead of duplicating them; the index append is guarded by a
per-batch marker file, and a crash BETWEEN append and marker at worst
leaves duplicate band rows — which the pair stage is immune to (final
``.distinct()``; the bucket cap counts distinct media ids).

100 TB: each micro-batch pays one narrow hash stage + the
partition-pruned pair join; history media are never re-read — the
steady-state crawl cost is O(batch), the q107/q112/q115 discipline.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pincspark.operators.fingerprint_index import (
    fingerprint_pairs_for_batch,
    update_fingerprint_index,
)


def _default_hasher(batch_df: DataFrame) -> DataFrame:
    """Image dhash hasher: media rows -> (media_id, fhash)."""
    from pincspark.operators.image_hash import decode_image_hashes

    return decode_image_hashes(batch_df, strict=False).select(
        "media_id", F.col("dhash").alias("fhash")
    )


def perceptual_quarantine_sink(
    index_path: str,
    quarantine_path: str,
    hasher: Callable[[DataFrame], DataFrame] = _default_hasher,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> Callable[[DataFrame, int], None]:
    """``writeStream.foreachBatch`` adapter: fold the batch into the
    fingerprint store and write one verdict row per media item
    (media_id, status, matched_id, hamming, batch) to
    ``quarantine_path``. See module docstring for the verdict codes and
    the exactly-once argument."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from pincspark.staging import stage

        hashed = stage(
            hasher(batch_df), f"perceptual:batch{batch_id}", eager=True
        )
        marker = os.path.join(index_path, "applied", f"batch={batch_id}")
        if os.path.exists(marker):
            # Replay after a crash: the store already holds this batch —
            # recompute the (deterministic) pairs without re-appending.
            pairs = fingerprint_pairs_for_batch(
                spark,
                index_path,
                hashed,
                max_hamming=max_hamming,
                max_bucket_size=max_bucket_size,
            )
        else:
            pairs = update_fingerprint_index(
                spark,
                hashed,
                index_path,
                max_hamming=max_hamming,
                max_bucket_size=max_bucket_size,
            )
            # update's append is an eager action — by here the batch is
            # durably in the store, so the marker is safe to drop. A
            # crash BEFORE this line replays the whole batch: the
            # re-append duplicates band rows (pair stage immune, see
            # module docstring) and the verdict partition overwrites.
            os.makedirs(marker, exist_ok=True)

        ids = hashed.select("media_id")
        # Per-media partner census: every pair touches the batch; a
        # partner OUTSIDE the batch is history. Deterministic partner =
        # lexicographic min (hamming, partner id).
        e = pairs.select(
            F.col("id_a").alias("m"), F.col("id_b").alias("o"), "hamming"
        ).unionByName(
            pairs.select(
                F.col("id_b").alias("m"), F.col("id_a").alias("o"), "hamming"
            )
        )
        e = e.join(
            F.broadcast(
                ids.select(F.col("media_id").alias("o")).withColumn(
                    "__in_batch", F.lit(True)
                )
            ),
            "o",
            "left",
        )
        agg = e.groupBy("m").agg(
            F.max(
                F.when(F.col("__in_batch").isNull(), 1).otherwise(0)
            ).alias("__has_hist"),
            F.min(F.struct("hamming", "o")).alias("__best"),
        )
        verdicts = (
            hashed.join(agg, hashed["media_id"] == agg["m"], "left")
            .select(
                "media_id",
                F.when(F.col("fhash").isNull(), F.lit("no_fingerprint"))
                .when(F.col("__has_hist") == 1, F.lit("near_dup_history"))
                .when(F.col("m").isNotNull(), F.lit("near_dup_batch"))
                .otherwise(F.lit("unique"))
                .alias("status"),
                F.col("__best.o").alias("matched_id"),
                F.col("__best.hamming").alias("hamming"),
            )
            .withColumn("batch", F.lit(batch_id))
        )
        (
            verdicts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(quarantine_path)
        )

    return _fn


def perceptual_quarantine_stream(
    media_stream: DataFrame,
    index_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    hasher: Callable[[DataFrame], DataFrame] = _default_hasher,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
):
    """Start the quarantine stream: media rows (media_id, content, kind)
    -> per-batch fold + reason-coded verdicts. Returns the
    StreamingQuery."""
    return (
        media_stream.writeStream.foreachBatch(
            perceptual_quarantine_sink(
                index_path,
                quarantine_path,
                hasher,
                max_hamming,
                max_bucket_size,
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
