"""WARC (ISO 28500) web-archive source — the Common Crawl interchange.

The reference ingests already-fetched pages one at a time
(``ontotagtext.py`` tags strings the caller extracted; reference
``app.py`` wires a fetch→extract→tag loop).  At web scale the corpus
arrives as WARC archives — Common Crawl publishes ~90k ``.warc.gz``
files of ~1 GiB per monthly crawl, each a concatenation of
independently-gzipped records.  This source maps those archives
directly onto the engine's ``documents`` schema so ``jobs/kg_build.py
--warc`` runs the full production path from the raw crawl artifact.

Scale design
------------
* **File-level parallelism.** Gzip streams are not splittable without a
  side index, and Common Crawl's layout is many ~1 GiB members — one
  task per archive file is the natural (and the industry-standard)
  split granularity.  ``spark.read.format("binaryFile")`` gives
  (path, content) per file; at 100 TB the crawl is ~100k files, far
  more than any executor count, so the stage stays fully parallel.
* **Bounded memory.** ``.warc.gz`` decompression is streamed gzip
  member by gzip member (``zlib.decompressobj`` + ``unused_data``), and
  records are framed by their ``Content-Length`` header — peak state is
  one record, never the whole archive.
* **Arrow-batched parse.** Record parsing runs in ``mapInPandas``; no
  driver-side reads, no collect.

Fixture writer
--------------
``write_warc`` emits spec-compliant WARC/1.0 bytes (optionally one gzip
member per record, Common Crawl style) deterministically: record ids
are UUIDv5 of (url, date) and gzip headers carry ``mtime=0``, so a
fixture is a pure function of its rows.
"""

from __future__ import annotations

import gzip
import uuid
import zlib
from datetime import datetime, timezone

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


# --------------------------------------------------------------------------
# record parsing (pure functions — unit-testable without Spark)
# --------------------------------------------------------------------------

def iter_gzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member in ``data``.

    Common Crawl archives are *multi-member* gzip (one member per WARC
    record) so that a record can be fetched and inflated in isolation;
    ``gzip.decompress`` would concatenate them, losing the framing and
    buffering the whole archive.  This iterates members with bounded
    memory.
    """
    pos = 0
    view = memoryview(data)
    while pos < len(data):
        d = zlib.decompressobj(wbits=47)  # gzip container
        chunk = d.decompress(view[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC archive")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # pragma: no cover — zlib always advances
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def _parse_header_block(block: bytes) -> dict[str, str]:
    """Parse a WARC (or HTTP) header block into a lower-cased-key dict."""
    headers: dict[str, str] = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" not in line:
            continue  # version line / malformed
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = (
            v.strip().decode("utf-8", "replace"))
    return headers


def iter_warc_records(data: bytes):
    """Yield ``(headers, payload)`` per record in an uncompressed stream.

    Framing follows the spec: a header block terminated by a blank line,
    then exactly ``Content-Length`` payload bytes, then two CRLFs.  The
    payload is *never* scanned for record markers — a page whose body
    contains the literal string ``WARC/1.0`` cannot split a record.
    """
    pos, n = 0, len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] in (_CRLF, b"\n\r"):
            pos += 2
        while pos < n and data[pos:pos + 1] == b"\n":
            pos += 1
        if pos >= n:
            return
        if data[pos:pos + 5] != b"WARC/":
            raise ValueError(
                f"expected WARC record header at offset {pos}, got "
                f"{data[pos:pos + 16]!r}")
        end = data.find(_HDR_END, pos)
        sep = 4
        if end == -1:
            end = data.find(b"\n\n", pos)
            sep = 2
        if end == -1:
            raise ValueError("unterminated WARC header block")
        headers = _parse_header_block(data[pos:end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") from None
        body_start = end + sep
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield headers, payload
        pos = body_start + length


def http_response_body(payload: bytes) -> bytes:
    """Strip the HTTP status line + headers from a ``response`` payload."""
    end = payload.find(_HDR_END)
    if end == -1:
        end = payload.find(b"\n\n")
        return payload if end == -1 else payload[end + 2:]
    return payload[end + 4:]


def _parse_warc_date(value: str):
    """``WARC-Date`` (ISO 8601, UTC) → naive-UTC datetime (engine norm —
    corpus.py stores warc_ts the same way)."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_warc_file(data: bytes, gzipped: bool):
    """Yield one dict per record in a (possibly gzipped) WARC file."""
    streams = iter_gzip_members(data) if gzipped else (data,)
    for stream in streams:
        for headers, payload in iter_warc_records(stream):
            warc_type = headers.get("warc-type", "")
            body = (http_response_body(payload)
                    if warc_type == "response" else payload)
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
                "record_id": headers.get("warc-record-id"),
                "warc_type": warc_type,
                "content_type": headers.get("content-type"),
                "html": body,
            }


# --------------------------------------------------------------------------
# Spark source
# --------------------------------------------------------------------------

WARC_RECORDS_SCHEMA = (
    "url string, warc_ts timestamp, record_id string, warc_type string, "
    "content_type string, html binary"
)

_RECORD_COLS = ["url", "warc_ts", "record_id", "warc_type",
                "content_type", "html"]


def read_warc(spark, path, record_types=("response",)):
    """Distributed WARC scan → one row per record of the wanted types.

    ``path`` is any ``binaryFile`` glob (``s3://crawl/**/*.warc.gz``).
    One task per archive file; records parsed Arrow-batch-side.
    """
    import pandas as pd

    types = set(record_types) if record_types else None
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                gz = str(fpath).endswith(".gz")
                for rec in parse_warc_file(bytes(content), gzipped=gz):
                    if types is None or rec["warc_type"] in types:
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=_RECORD_COLS)

    return files.mapInPandas(parse, schema=WARC_RECORDS_SCHEMA)


def warc_documents(spark, path):
    """WARC archives → the engine's ``documents`` shape.

    ``text`` is absent by construction (raw crawl bytes): feed this to
    the ``--from-html`` tagging path, which fuses P1 extraction into the
    tagging batch.
    """
    from pyspark.sql import functions as F

    return (read_warc(spark, path, record_types=("response",))
            .where(F.col("url").isNotNull())
            .select("url", "warc_ts", "html"))


# --------------------------------------------------------------------------
# fixture writer (driver-side, deterministic)
# --------------------------------------------------------------------------

def warc_record_bytes(url: str, date: str, body: bytes,
                      warc_type: str = "response",
                      content_type: str = "text/html; charset=utf-8",
                      ) -> bytes:
    """Serialize one spec-compliant WARC/1.0 record."""
    if warc_type == "response":
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: "
                   + content_type.encode("latin-1")
                   + b"\r\nContent-Length: " + str(len(body)).encode()
                   + _HDR_END + body)
        warc_ctype = "application/http; msgtype=response"
    else:
        payload = body
        warc_ctype = content_type
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}")
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode("latin-1"),
             b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">",
             b"WARC-Date: " + date.encode("latin-1")]
    if url:
        lines.append(b"WARC-Target-URI: " + url.encode("latin-1"))
    lines += [b"Content-Type: " + warc_ctype.encode("latin-1"),
              b"Content-Length: " + str(len(payload)).encode()]
    return _CRLF.join(lines) + _HDR_END + payload + _HDR_END


def write_warc(path: str, records, warcinfo: str | None = "engine fixture"):
    """Write records (dicts with url/date/body[, warc_type]) to ``path``.

    ``.gz`` suffix selects Common-Crawl-style member-per-record gzip.
    Deterministic: fixed gzip mtime, UUIDv5 record ids.
    """
    per_record_gzip = path.endswith(".gz")

    def _compress(blob: bytes) -> bytes:
        return gzip.compress(blob, mtime=0) if per_record_gzip else blob

    with open(path, "wb") as fh:
        if warcinfo is not None:
            info = warc_record_bytes(
                url="", date="2026-01-01T00:00:00Z",
                body=(f"software: {warcinfo}\r\n").encode(),
                warc_type="warcinfo",
                content_type="application/warc-fields")
            fh.write(_compress(info))
        for rec in records:
            blob = warc_record_bytes(
                url=rec["url"], date=rec["date"], body=rec["body"],
                warc_type=rec.get("warc_type", "response"))
            fh.write(_compress(blob))
