"""ST1 — streaming multi-part message reassembly as a keyed stateful
operator.

Reference parity: ais_ingressServer.py:84-106 buffers fragments per feed
until ``len(buf) == total_package``, validates monotonic package numbers and
a constant package id, then emits the joined group; out-of-sequence groups
are dropped (ais_analysis.py:284-286).

Spark-first: ``applyInPandasWithState`` keyed by (seq_id, channel) — the
same key the on-air slot protocol uses. State holds the partial fragment
buffer; complete+valid groups emit one row with the concatenated payload and
the first fragment's tag-block event time. A processing-time timeout evicts
abandoned partial groups (the reference leaks them). Batch jobs should use
``pincspark.sources.nmea_source.reassemble`` (pure relational) — this
operator exists for the live ingest path.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("nums", T.ArrayType(T.IntegerType()), True),
    T.StructField("payloads", T.ArrayType(T.StringType()), True),
    T.StructField("tagblocks", T.ArrayType(T.StringType()), True),
    T.StructField("total", T.IntegerType(), True),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("seq_id", T.IntegerType(), True),
    T.StructField("channel", T.StringType(), True),
    T.StructField("tagblock", T.StringType(), True),
    T.StructField("n_sentences", T.IntegerType(), True),
    T.StructField("payload", T.StringType(), True),
])


def _make_reassemble_group(timeout_ms: int | None):
    def _reassemble_group(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seq_id, channel = key
        if state.hasTimedOut:
            state.remove()
            return

        nums: list[int] = []
        payloads: list[str] = []
        tagblocks: list[str] = []
        total = 0
        if state.exists:
            nums, payloads, tagblocks, total = state.get
            nums, payloads, tagblocks = list(nums), list(payloads), list(tagblocks)

        out = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                if row.total <= 1:
                    # a malformed singleton claiming num != 1 drops, like
                    # the batch twin's singles branch and the oracle's
                    # nums == 1..total check (ADVICE r10 #3 — this exact
                    # shape, total==1/num==2, was unexercised and the
                    # stream path emitted it)
                    if int(row.num) == 1:
                        out.append((seq_id, channel, row.tagblock, 1, row.payload))
                    continue
                if total and row.total != total:
                    # id reused with a different total: drop the stale partial
                    nums, payloads, tagblocks = [], [], []
                total = int(row.total)
                nums.append(int(row.num))
                payloads.append(row.payload)
                tagblocks.append(row.tagblock)
                if len(nums) >= total:
                    if sorted(nums) == list(range(1, total + 1)):
                        order = sorted(range(total), key=lambda i: nums[i])
                        out.append((
                            seq_id, channel, tagblocks[order[0]], total,
                            "".join(payloads[i] for i in order),
                        ))
                    # complete-but-invalid groups dropped, like the reference
                    nums, payloads, tagblocks, total = [], [], [], 0

        if nums:
            state.update((nums, payloads, tagblocks, total))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()

        if out:
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return _reassemble_group


def reassemble_stream(df: DataFrame, timeout_ms: int | None = 60_000) -> DataFrame:
    """Apply ST1 to a tokenized sentence stream (columns per
    ``nmea_source.tokenize_sentences``: seq_id, channel, total, num,
    payload, tagblock).

    ``timeout_ms`` evicts abandoned partial groups (the reference leaks
    them); pass None for NoTimeout (deterministic micro-batch tests —
    processing-time timeouts keep scheduling wake-up batches).
    """
    return (
        df.groupBy("seq_id", "channel")
        .applyInPandasWithState(
            _make_reassemble_group(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
