"""The registered `nmea` Python data source: row parity with
read_archive, per-file partition planning, per-file line numbering, and
the downstream decode path running unchanged on its output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pincspark.sources.nmea_datasource import register

TAG = "\\s:rDS,c:1673222400,i:X*32"
S1 = "!ABVDM,1,1,7,A,15R9eN001n7DHvT13w0TBSM>00Rm,0*54"
S2A = "!ABVDM,2,1,4,A,58I3mA82@Es3UKOOGB0l4E9<f1L4hhU>22222217H147I?610K54480CPj3l,0*14"
S2B = "!ABVDM,2,2,4,A,PAiH8888880,2*1B"


@pytest.fixture()
def archive_dir(spark, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    (d / "a.txt").write_text(f"{TAG}{S1}\n\nnoise line without bang\n")
    (d / "b.txt").write_text(f"{TAG}{S2A}\n{TAG}{S2B}\n")
    register(spark)
    return str(d)


def test_rows_match_read_archive(spark, archive_dir):
    got = {
        (r["tagblock"], r["sentence"])
        for r in spark.read.format("nmea").load(archive_dir).collect()
    }
    from pincspark.sources.nmea_source import read_archive

    want = {
        (r["tagblock"], r["sentence"])
        for r in read_archive(spark, archive_dir).collect()
    }
    assert got == want and len(got) == 3


def test_partition_per_file_and_per_file_line_idx(spark, archive_dir):
    df = spark.read.format("nmea").load(archive_dir)
    parts = df.select(F.spark_partition_id().alias("p"), "path").distinct().collect()
    # one partition per archive file
    assert len({r["p"] for r in parts}) == 2
    by_file = {
        r["path"].rsplit("/", 1)[-1]: r["line_idx"]
        for r in df.filter(F.col("sentence") == S2B).collect()
    } | {
        r["path"].rsplit("/", 1)[-1]: r["line_idx"]
        for r in df.filter(F.col("sentence") == S1).collect()
    }
    assert by_file == {"b.txt": 1, "a.txt": 0}  # numbering restarts per file


def test_decode_path_runs_on_datasource_output(spark, archive_dir):
    """The existing reassemble + decode stack consumes the source's output
    unchanged (same columns as read_archive plus path)."""
    from pincspark.decode.kernel import decode_ais
    from pincspark.sources.nmea_source import reassemble, tokenize_sentences, with_tagblock_ts

    df = spark.read.format("nmea").load(archive_dir)
    grouped = reassemble(tokenize_sentences(with_tagblock_ts(df)))
    decoded = decode_ais(grouped)
    types = sorted(
        r["t"] for r in decoded.select(F.col("ais.messageType").alias("t")).collect()
    )
    assert types == [1, 5]  # the position report and the reassembled static


def test_ingest_census_accounts_for_every_line(spark):
    """q110's conservation law: line statuses + group outcomes account for
    EVERY archive line exactly once, and the counts equal an independent
    pure-Python replay of the documented contract (third implementation
    next to the engine and the DuckDB oracle)."""
    from functools import reduce
    from operator import xor

    from pincspark.plans.queries import INGEST_ARCHIVE, q110_ingest_census

    expect: dict[str, int] = {}
    valid = []  # (line_no, total, num, seq)
    for i, line in enumerate(INGEST_ARCHIVE):
        if line == "":
            k = "empty"
        elif "!" not in line:
            k = "no_bang"
        else:
            sentence = line[line.index("!"):]
            if "*" not in sentence:
                k = "no_checksum"
            else:
                body, _, decl = sentence.partition("*")
                if reduce(xor, body[1:].encode(), 0) != int(decl, 16):
                    k = "bad_checksum"
                else:
                    p = sentence.split(",")
                    valid.append((i, int(p[1] or 1), int(p[2] or 1), int(p[3] or 0)))
                    continue
        expect[k] = expect.get(k, 0) + 1
    groups: dict[tuple, list[int]] = {}
    for line_no, total, num, seq in valid:
        groups.setdefault((line_no - (num - 1), seq, total), []).append(num)
    for (gkey, seq, total), nums in groups.items():
        ok = sorted(nums) == list(range(1, total + 1))
        k = "assembled" if ok else "orphaned"
        expect[k] = expect.get(k, 0) + len(nums)

    got = {r["status"]: r["n"] for r in q110_ingest_census(spark, "").collect()}
    assert sum(got.values()) == len(INGEST_ARCHIVE)
    assert got == expect
    # the corpus really exercises every class
    assert set(expect) == {
        "empty", "no_bang", "no_checksum", "bad_checksum", "assembled", "orphaned"
    }
