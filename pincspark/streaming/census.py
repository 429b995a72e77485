"""Ingest quarantine census — batch (q110's engine) and streaming form.

The reference silently discards bad input (ais_analysis.py:266-288 drops
checksum/sequence failures with no trace); q110 established the batch
accounting: every line classified with a reason code (empty / no_bang /
no_checksum / bad_checksum / assembled / orphaned) and counted. This
module is that classifier made OPERATIONAL:

- `classify_lines` — the stateless line tier as one shared expression,
  used by BOTH the batch census (q110, the hard oracle gate) and the
  streaming form, so the drop rules cannot drift between them;
- `batch_ingest_census` — q110's engine body (adjacency-keyed group
  outcomes), reusable over any line corpus;
- `quarantine_census_stream` — the live form: a reason-coded row PER
  INPUT LINE (the quarantine sink an operator pages on when `orphaned`
  spikes), group outcomes decided by (seq_id, channel) keyed state like
  ST1's `reassemble_stream`, with timeout-evicted partials emitted as
  `orphaned` instead of leaking (the reference leaks them,
  ais_ingressServer.py:84-106).

Stream-vs-batch: the group key differs by design (live feeds have
per-connection framing, archives don't — see
test_st1_stream_vs_batch_on_reassembly_contract_corpus); on an in-order,
non-interleaved corpus the two censuses agree row for row (pinned in
tests/test_streaming.py), and the stateless tier is the same expression
object on both paths.

100 TB: the stateless tier is whole-stage codegen ahead of any state;
keyed state shards by (seq_id, channel); the per-line output is
append-mode (each line's verdict emits exactly once, checkpoint-safe).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CENSUS_OUTPUT = T.StructType([
    T.StructField("seq_id", T.IntegerType(), True),
    T.StructField("channel", T.StringType(), True),
    T.StructField("num", T.IntegerType(), True),
    T.StructField("status", T.StringType(), False),
])


def classify_lines(df: DataFrame) -> DataFrame:
    """Stateless line tier (first match wins): adds ``bang``,
    ``sentence`` and ``status`` (empty / no_bang / no_checksum /
    bad_checksum — the REAL P2 `checksum_valid` expression; NULL when the
    line survives to the reassembly tier). Shared verbatim by the batch
    census (q110's oracle re-derives every class independently) and the
    streaming census."""
    from pincspark.decode.kernel import checksum_valid

    base = df.select(
        "*",
        F.instr("value", "!").alias("bang"),
        F.expr("substring(value, instr(value, '!'))").alias("sentence"),
    )
    return base.withColumn(
        "status",
        F.when(F.col("value") == "", "empty")
        .when(F.col("bang") == 0, "no_bang")
        .when(F.instr("sentence", "*") == 0, "no_checksum")
        .when(
            ~F.coalesce(checksum_valid(F.col("sentence")), F.lit(False)),
            "bad_checksum",
        ),
    )


def batch_ingest_census(df: DataFrame) -> DataFrame:
    """q110's engine over any (line_idx LONG, value STRING) corpus:
    line-tier reason codes, then adjacency-keyed reassembly outcomes
    (assembled = fragments exactly 1..total under one seq id; anything
    else orphaned). Returns (status, n BIGINT)."""
    from pincspark.sources.nmea_source import tokenize_sentences

    line_status = classify_lines(df)
    valid = tokenize_sentences(
        line_status.filter(F.col("status").isNull())
    ).withColumn("gkey", F.col("line_idx") - (F.col("num") - F.lit(1)))
    groups = valid.groupBy("gkey", "seq_id", "total").agg(
        F.count(F.lit(1)).alias("n_frags"),
        F.sort_array(F.collect_list("num")).alias("nums"),
    )
    grouped_lines = valid.join(groups, ["gkey", "seq_id", "total"]).select(
        F.when(
            (F.col("n_frags") == F.col("total"))
            & F.expr("nums = sequence(1, total)"),
            "assembled",
        )
        .otherwise("orphaned")
        .alias("status")
    )
    return (
        line_status.filter(F.col("status").isNotNull())
        .select("status")
        .unionByName(grouped_lines)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _make_census_group(timeout_ms: int | None):
    def _census_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seq_id, channel = key
        cols = [f.name for f in CENSUS_OUTPUT.fields]
        if state.hasTimedOut:
            # abandoned partial: every buffered fragment is accounted as
            # orphaned — the census's whole point vs the reference leak
            nums, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(seq_id, channel, int(n), "orphaned") for n in nums],
                columns=cols,
            )
            return

        nums: list[int] = []
        total = 0
        if state.exists:
            nums, total = state.get
            nums = list(nums)

        out = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                if row.total <= 1:
                    # same malformed-singleton rule as reassemble_stream
                    status = "assembled" if int(row.num) == 1 else "orphaned"
                    out.append((seq_id, channel, int(row.num), status))
                    continue
                if total and row.total != total:
                    # id reused with a different total: the stale partial
                    # can never complete — quarantine it
                    out.extend((seq_id, channel, int(n), "orphaned") for n in nums)
                    nums = []
                total = int(row.total)
                nums.append(int(row.num))
                if len(nums) >= total:
                    ok = sorted(nums) == list(range(1, total + 1))
                    status = "assembled" if ok else "orphaned"
                    out.extend((seq_id, channel, int(n), status) for n in nums)
                    nums, total = [], 0

        if nums:
            state.update((nums, total))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(out, columns=cols)

    return _census_group


_CENSUS_STATE = T.StructType([
    T.StructField("nums", T.ArrayType(T.IntegerType()), True),
    T.StructField("total", T.IntegerType(), True),
])


def quarantine_census_stream(
    df: DataFrame, timeout_ms: int | None = 60_000
) -> DataFrame:
    """Streaming reason-coded quarantine: one output row PER INPUT LINE
    with (seq_id, channel, num, status). Line-tier rejects emit
    immediately (stateless, seq_id/channel/num NULL where the line never
    tokenized); surviving fragments get their group outcome from
    (seq_id, channel) keyed state — assembled when the group completes
    exactly 1..total, orphaned on a bad completion, a reused id, or
    timeout eviction. ``timeout_ms=None`` keeps tests deterministic
    (partials stay pending), exactly like `reassemble_stream`."""
    from pincspark.sources.nmea_source import tokenize_sentences

    classified = classify_lines(df)
    bad = classified.filter(F.col("status").isNotNull()).select(
        F.lit(None).cast("int").alias("seq_id"),
        F.lit(None).cast("string").alias("channel"),
        F.lit(None).cast("int").alias("num"),
        "status",
    )
    frags = tokenize_sentences(classified.filter(F.col("status").isNull()))
    grouped = frags.groupBy("seq_id", "channel").applyInPandasWithState(
        _make_census_group(timeout_ms),
        outputStructType=CENSUS_OUTPUT,
        stateStructType=_CENSUS_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
    return grouped.unionByName(bad)
