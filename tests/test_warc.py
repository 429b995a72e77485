"""WARC reader: member splitting, header/HTTP parsing, type filtering,
malformed-input behavior, and synth-template <-> SQL-oracle lockstep."""

from __future__ import annotations

import gzip

import duckdb
import pytest

from pincspark.sources.warc import (
    _HTML_TMPL,
    parse_warc_member,
    split_gzip_members,
    synth_html,
    warc_records,
    warc_synth,
)


def _record(wtype: str, payload: bytes, uri: str = "http://x/doc/1") -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + wtype.encode() + b"\r\n"
        b"WARC-Target-URI: " + uri.encode() + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )


def test_split_gzip_members_roundtrip():
    members = [b"alpha", b"beta" * 100, b""]
    stream = b"".join(gzip.compress(m, mtime=0) for m in members)
    assert split_gzip_members(stream) == members


def test_split_gzip_members_truncated_raises():
    stream = gzip.compress(b"ok", mtime=0) + gzip.compress(b"cut", mtime=0)[:-5]
    with pytest.raises(ValueError, match="truncated"):
        split_gzip_members(stream)


def test_parse_warc_member_headers_and_payload():
    rec = parse_warc_member(_record("response", b"HTTP/1.1 200 OK\r\n\r\nhi"))
    assert rec["version"] == "WARC/1.0"
    assert rec["headers"]["warc-type"] == "response"
    assert rec["payload"].endswith(b"hi")


def test_parse_warc_member_malformed():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc_member(b"HTTP/1.1 200 OK\r\n\r\n")
    short = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nonly-a-few"
    )
    with pytest.raises(ValueError, match="shorter"):
        parse_warc_member(short)


def test_warc_records_filters_types_and_parses_http(spark):
    http = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
    stream = b"".join(
        gzip.compress(m, mtime=0)
        for m in (
            _record("request", b"GET / HTTP/1.1\r\n\r\n"),
            _record("response", http),
            _record("metadata", b"fetch-ms: 12"),
        )
    )
    archives = spark.createDataFrame(
        [(0, bytearray(stream))], "archive_id int, data binary"
    )
    rows = warc_records(archives).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "response" and r["http_status"] == 404
    assert r["content_type"] == "text/plain"
    assert bytes(r["body"]) == b"gone" and r["body_len"] == 4
    # non-HTTP payloads pass through with null status when asked for
    meta = warc_records(archives, warc_types=("metadata",)).collect()
    assert meta[0]["http_status"] is None
    assert bytes(meta[0]["body"]) == b"fetch-ms: 12"


def test_synth_roundtrip_small(spark):
    docs = spark.createDataFrame(
        [(7, "hello world one", "en", "srcA"), (12, "two words", "en", "srcB")],
        "doc_id long, text string, lang string, source string",
    )
    recs = warc_records(warc_synth(docs, n_archives=2)).collect()
    by_uri = {r["uri"]: r for r in recs}
    assert set(by_uri) == {
        "http://example.com/doc/7",
        "http://example.com/doc/12",
    }
    body = bytes(by_uri["http://example.com/doc/7"]["body"]).decode()
    assert body == synth_html(7, "srcA", "hello world one")
    assert all(r["http_status"] == 200 for r in recs)


def test_sql_template_lockstep():
    """_SQL_HTML (the q73 oracle's reconstruction) and _HTML_TMPL (the
    Python synth) must be the same string function — evaluate both on one
    row and compare exactly."""
    from pincspark.plans.queries import _SQL_HTML

    con = duckdb.connect()
    got = con.execute(
        f"SELECT {_SQL_HTML} FROM (SELECT 42 AS doc_id, 'srcZ' AS source, "
        "'a b c' AS text)"
    ).fetchone()[0]
    assert got == _HTML_TMPL.format(doc_id=42, source="srcZ", text="a b c")
