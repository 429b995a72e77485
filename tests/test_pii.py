"""PII detection/redaction (functions/pii.py): planted fixtures, chain
order, the scrubbed-output-is-clean invariant, and Spark==DuckDB twin
behavior on tricky strings."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pincspark.functions.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    REDACTIONS,
    pii_count,
    redact_pii,
    redact_pii_sql,
)

FIXTURES = [
    "reach me at jane.doe+spam@sub.example.co.uk today",
    "two mails a@b.io and c.d@e-f.org here",
    "server 10.0.255.3 and 192.168.1.77 up",
    "call 415-555-0199 or 212-555-0000",
    "mixed bob@x.yz on 8.8.8.8 at 650-555-1234",
    "clean text with no secrets at all",
    "not-an-ip 1234.5.6.7890 and half 415-555-01",
]


def _df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(FIXTURES)], "i INT, text STRING")


def test_counts_planted(spark):
    t = F.col("text")
    rows = (
        _df(spark)
        .select(
            "i",
            pii_count(t, EMAIL_RE).alias("e"),
            pii_count(t, IPV4_RE).alias("ip"),
            pii_count(t, PHONE_RE).alias("ph"),
        )
        .collect()
    )
    got = {r["i"]: (r["e"], r["ip"], r["ph"]) for r in rows}
    assert got[0] == (1, 0, 0)
    assert got[1] == (2, 0, 0)
    assert got[2] == (0, 2, 0)
    assert got[3] == (0, 0, 2)
    assert got[4] == (1, 1, 1)
    assert got[5] == (0, 0, 0)
    # 1234.5.6.7890: the leading run is 4 digits so \b\d{1,3}\. cannot
    # anchor at a word boundary -> no IPv4; truncated phone -> no match
    assert got[6] == (0, 0, 0)


def test_redaction_chain_and_clean_invariant(spark):
    t = F.col("text")
    out = _df(spark).select("i", redact_pii(t).alias("red"))
    reds = {r["i"]: r["red"] for r in out.collect()}
    assert reds[4] == "mixed <EMAIL> on <IP> at <PHONE>"
    assert reds[5] == FIXTURES[5]
    # invariant: redacted output contains no residual matches
    residual = (
        out.select(
            (
                pii_count(F.col("red"), EMAIL_RE)
                + pii_count(F.col("red"), IPV4_RE)
                + pii_count(F.col("red"), PHONE_RE)
            ).alias("n")
        )
        .agg(F.sum("n").alias("n"))
        .collect()[0]["n"]
    )
    assert residual == 0


def test_sql_twin_matches_spark(spark):
    """The DuckDB RE2 twin must redact every fixture identically to the
    Java-regex Spark path — the property the q39 oracle gate relies on."""
    spark_reds = [
        r["red"]
        for r in _df(spark).orderBy("i").select(redact_pii(F.col("text")).alias("red")).collect()
    ]
    con = duckdb.connect()
    expr = redact_pii_sql("t")
    duck_reds = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [s]).fetchone()[0]
        for s in FIXTURES
    ]
    assert spark_reds == duck_reds
    assert len(REDACTIONS) == 3
