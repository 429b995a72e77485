"""Physical-plan shape assertions: the scale properties the engine promises
(pushdown, pruning, broadcast, codegen) must be visible in .explain output —
a correct result from a bad plan is a 100-TB regression waiting to happen."""

from __future__ import annotations

from pincspark.plans import queries as Q
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """q04's routing filter must reach the parquet scan as PushedFilters."""
    df = Q.q04_event_route(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "In(event_type" in plan or "event_type" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    """A 2-column projection must not read all event columns."""
    from pincspark.sources.tables import table
    from pyspark.sql import functions as F

    df = table(spark, SF_DIR, "events").select("event_id", "user_id")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "user_id" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_dimension_joins_are_broadcast(spark):
    """q03's nation/region hops must be broadcast hash joins, never
    shuffle/sort-merge (the dims are tiny)."""
    plan = _plan(Q.q03_region_enrich(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_single_shuffle(spark):
    """The as-of join is union + ONE keyed window — exactly one exchange on
    the key, and no join operator at all."""
    plan = _plan(Q.q06_asof_enrich(spark, SF_DIR))
    assert "Join" not in plan.replace("JoinedRow", "")
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # AQE may split


def test_static_pip_single_scan_no_hof(spark):
    """q23's ray casting: ONE file scan for all zones (array+explode, not a
    per-zone union), statically unrolled predicates (no array-fold HOF),
    codegen'd ('*(n)' prefixes) up to the Generate. AQE is disabled for the
    inspection so the physical plan is final at analysis time."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(Q.q23_zone_occupancy(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("FileScan") == 1
    assert "aggregate(" not in plan  # no interpreted array fold
    assert "*(1)" in plan  # codegen stages present


def test_decode_routing_prunes_before_python(spark, tmp_path):
    """Filtering on the SQL routing fast path must not invoke the Python
    decode for filtered-out rows: the filter sits below ArrowEvalPython."""
    from pyspark.sql import functions as F

    from pincspark.decode.kernel import decode_ais, routing_message_type

    df = spark.createDataFrame(
        [("15R9eN001n7DHvT13w0TBSM>00Rm",), ("55555555555555555555",)],
        "payload STRING",
    )
    routed = df.filter(routing_message_type(F.col("payload")).isin(1, 2, 3))
    decoded = decode_ais(routed)
    plan = _plan(decoded)
    python_idx = plan.find("ArrowEvalPython")
    filter_idx = plan.find("Filter")
    assert python_idx != -1 and filter_idx != -1
    assert filter_idx > python_idx  # printed tree: children below parents
