"""Sequence packing for LLM training: lay documents end-to-end into
fixed-token-budget training sequences, deterministically.

A pre-training loader wants every training example to be exactly ``budget``
tokens, so documents are concatenated in a reproducible shuffled order and
the stream is cut every ``budget`` tokens. This operator computes, for every
document, WHERE it lands: its shard, its position, the sequence id its
first token falls into, and the offset inside that sequence. A document
whose tokens straddle a cut simply continues into the next sequence (the
standard "packing with document spanning" used by GPT-style pipelines —
boundaries are marked with EOS by the tokenizer, not re-aligned here).

Spark-first shape (100 TB): documents hash into ``num_shards`` independent
token streams (same md5 sharding as sampling.deterministic_shards), so the
plan is ONE shuffle on the shard key plus a per-shard sort and running sum
— a window over partitionBy(shard), never a global total order. num_shards
scales with the corpus; each shard's packing is independent and
reproducible, so a re-run (or a backfill of one shard) yields identical
sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pincspark.functions.text import token_count
from pincspark.operators.sampling import sample_hash


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    num_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document its packed location: (shard, pos, n_tokens,
    seq_id, offset).

    - ``shard``: pmod(md5-hash, num_shards) — the independent token stream
      this doc joins (reshuffle by changing ``salt``).
    - ``pos``: 0-based order within the shard (hash, then id — the
      reproducible shuffle order).
    - ``n_tokens``: whitespace token count (functions.text.token_count —
      swap in a real tokenizer's counts upstream if available; the packing
      math is count-agnostic).
    - ``seq_id``: floor(tokens_before / budget) — the training sequence the
      doc STARTS in, where tokens_before is the running token sum of all
      earlier docs in the shard.
    - ``offset``: tokens_before - seq_id * budget — the doc's first-token
      position inside that sequence.

    The running sum is a window aggregate over (shard, order), so the whole
    operator is one exchange + per-shard sort in whole-stage codegen.
    """
    h = sample_hash(F.col(id_col), salt)
    base = df.select(
        F.col(id_col),
        h.alias("__h"),
        F.pmod(h, F.lit(num_shards)).cast("int").alias("shard"),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return (
        base.withColumn("pos", F.row_number().over(w) - F.lit(1))
        .withColumn("__before", before)
        .select(
            id_col,
            "shard",
            "pos",
            "n_tokens",
            F.floor(F.col("__before") / F.lit(budget)).cast("bigint").alias("seq_id"),
            (F.col("__before") % F.lit(budget)).cast("bigint").alias("offset"),
        )
    )
