"""WARC web-archive ingest — the CommonCrawl-style entry point of a
training-data pipeline.

Format (public, ISO 28500 / the CommonCrawl layout): an archive file is a
concatenation of gzip MEMBERS, one WARC record per member, so a reader can
split records without decompressing the whole file. Each record is

    WARC/1.0\\r\\n
    <WARC headers: WARC-Type, WARC-Target-URI, Content-Length, ...>\\r\\n
    \\r\\n
    <Content-Length bytes of payload>\\r\\n\\r\\n

and a ``response`` record's payload is a raw HTTP/1.1 response (status
line, headers, body).

Two pieces:

- :func:`warc_synth` — a DETERMINISTIC archive builder over the
  ``documents`` table (fixed gzip mtime, fixed record template): the test
  corpus for the parser, standing in for a real crawl exactly the way the
  codec queries synthesize PNG/JPEG/FLAC payloads before decoding them.
- :func:`warc_records` — the from-scratch parser: ``mapInPandas`` over
  ``(archive_id, data binary)`` rows; inside each task a
  ``zlib.decompressobj`` loop splits gzip members (via ``unused_data``),
  then pure byte-slicing parses WARC headers and the embedded HTTP
  message. No external libraries.

Scale shape: archives are independent rows — the parse is a narrow
Arrow-batched map stage, embarrassingly parallel across however many
thousand archive files a real crawl has; no shuffle until the caller
aggregates. One archive = one row keeps memory bounded by the largest
archive (CommonCrawl caps ~1 GB); for bigger members the same loop works
streaming, which is noted rather than needed here.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"

# Deterministic synth template — the ORACLE reconstructs these strings in
# SQL, so every piece is a pure function of (doc_id, source, text).
_HTML_TMPL = (
    "<!DOCTYPE html>\n"
    "<html><head><title>Doc {doc_id} - {source}</title>\n"
    "<script>var x = 1; // not content</script>\n"
    "<style>body {{ margin: 0; }}</style>\n"
    "</head><body>\n"
    '<nav><a href="/home">Home</a> | <a href="/about">About</a></nav>\n'
    "<h1>Doc {doc_id}</h1>\n"
    "<p>{text}</p>\n"
    "<footer>&copy; 2023 Example &amp; Co.</footer>\n"
    "</body></html>"
)


def synth_html(doc_id: int, source: str, text: str) -> str:
    """The deterministic page body for one document (shared with
    `html_to_text`'s q74 synth)."""
    return _HTML_TMPL.format(doc_id=doc_id, source=source, text=text)


def _synth_record(doc_id: int, source: str, text: str) -> bytes:
    html = synth_html(doc_id, source, text).encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    rid = hashlib.md5(str(doc_id).encode()).hexdigest()
    warc = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.com/doc/" + str(doc_id).encode() + b"\r\n"
        b"WARC-Date: 2023-01-09T00:00:00Z\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    return gzip.compress(warc, mtime=0)


def warc_synth(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_archives: int = 8,
) -> DataFrame:
    """Pack documents into ``n_archives`` WARC archive files (gzip member
    per record, doc_id order within an archive) -> (archive_id int,
    data binary).

    mapInPandas so the member bytes are built where the rows already are;
    the only exchange is the repartition that forms the archive groups —
    at crawl scale the writer side of exactly this shape is how WARCs are
    produced (each task owns whole archives)."""
    schema = StructType(
        [
            StructField("archive_id", IntegerType()),
            StructField("data", BinaryType()),
        ]
    )
    na = int(n_archives)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_archive: dict[int, list[tuple[int, bytes]]] = {}
        for pdf in batches:
            for did, src, txt in zip(pdf[id_col], pdf["source"], pdf["text"]):
                did = int(did)
                by_archive.setdefault(did % na, []).append(
                    (did, _synth_record(did, src or "", txt or ""))
                )
        out = [
            (aid, b"".join(rec for _, rec in sorted(members)))
            for aid, members in sorted(by_archive.items())
        ]
        yield pd.DataFrame(out, columns=["archive_id", "data"])

    return (
        docs.select(id_col, "source", "text")
        .repartition(na, (F.col(id_col) % na).cast("int"))
        .mapInPandas(build, schema)
    )


_RECORD_SCHEMA = StructType(
    [
        StructField("archive_id", IntegerType()),
        StructField("rec_index", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("uri", StringType()),
        StructField("record_id", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("body_len", LongType()),
    ]
)


def split_gzip_members(data: bytes) -> list[bytes]:
    """Split a multi-member gzip stream into the decompressed members.
    ``zlib.decompressobj(47)`` stops at each member boundary and exposes
    the remainder as ``unused_data`` — the standard-library way to walk a
    CommonCrawl file without guessing member offsets."""
    out = []
    buf = data
    while buf:
        d = zlib.decompressobj(47)
        out.append(d.decompress(buf))
        buf = d.unused_data
        if not d.eof:  # truncated trailing member
            raise ValueError("truncated gzip member in WARC archive")
    return out


def parse_warc_member(raw: bytes) -> dict:
    """Parse one WARC record's bytes -> header dict + payload bytes."""
    if not raw.startswith(b"WARC/"):
        raise ValueError("missing WARC/ version line")
    head, rest = raw.split(_CRLF + _CRLF, 1)
    lines = head.split(_CRLF)
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().decode("ascii").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    clen = int(headers.get("content-length", "0"))
    payload = rest[:clen]
    if len(payload) < clen:
        raise ValueError("WARC payload shorter than Content-Length")
    return {"version": lines[0].decode("ascii"), "headers": headers, "payload": payload}


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    if _CRLF + _CRLF in payload:
        head, body = payload.split(_CRLF + _CRLF, 1)
    else:
        head, body = payload, b""
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ")
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
    return status, ctype, body


def warc_records(
    archives: DataFrame,
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Parse WARC archives -> one row per record: (archive_id, rec_index,
    warc_type, uri, record_id, http_status, content_type, body, body_len).

    ``warc_types`` filters records INSIDE the task (a real crawl is ~3
    records per page — request/response/metadata — and shipping only the
    responses through Arrow is a 3x transfer cut)."""
    want = set(warc_types) if warc_types else None

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["archive_id"], pdf["data"]):
                for i, member in enumerate(split_gzip_members(bytes(data))):
                    rec = parse_warc_member(member)
                    h = rec["headers"]
                    wtype = h.get("warc-type")
                    if want is not None and wtype not in want:
                        continue
                    status, ctype, body = _parse_http(rec["payload"])
                    rows.append(
                        (
                            int(aid),
                            i,
                            wtype,
                            h.get("warc-target-uri"),
                            h.get("warc-record-id"),
                            status,
                            ctype,
                            body,
                            len(body),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _RECORD_SCHEMA.fields])

    return archives.mapInPandas(parse, _RECORD_SCHEMA)
