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
* **Bounded memory.** ``.warc.gz`` decompression streams through
  ``GzipFile`` (linear over multi-member archives — see
  ``_warc_reader`` for why per-member ``decompressobj`` loops are
  quadratic), and records are framed by their ``Content-Length`` header
  off a rolling buffer — peak parser state is one record plus one read
  chunk, never the whole decompressed archive.
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
import io
import uuid
from datetime import datetime, timezone

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"


# --------------------------------------------------------------------------
# record parsing (pure functions — unit-testable without Spark)
# --------------------------------------------------------------------------

def _warc_reader(data: bytes, gzipped: bool):
    """File-like over the decompressed record stream.

    Common Crawl archives are *multi-member* gzip (one member per WARC
    record).  ``GzipFile`` concatenates members in LINEAR time with
    bounded internal state — per-member ``zlib.decompressobj`` loops are
    quadratic here, because every member boundary copies the whole
    remaining archive into ``unused_data`` (measured: a 54 MB / 25k-member
    shard takes >300 s that way, ~0.5 s this way).  Member boundaries
    are irrelevant for parsing: WARC records are self-framing via
    Content-Length.
    """
    bio = io.BytesIO(data)
    return gzip.GzipFile(fileobj=bio) if gzipped else bio


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


_READ_CHUNK = 1 << 20


def iter_warc_records(reader):
    """Yield ``(headers, payload)`` per record from a decompressed
    stream (file-like or bytes), with memory bounded by one record.

    Framing follows the spec: a header block terminated by a blank line,
    then exactly ``Content-Length`` payload bytes, then two CRLFs.  The
    payload is *never* scanned for record markers — a page whose body
    contains the literal string ``WARC/1.0`` cannot split a record.
    """
    if isinstance(reader, (bytes, bytearray, memoryview)):
        reader = io.BytesIO(reader)
    buf = bytearray()
    pos = 0
    eof = False
    while True:
        # drain every complete record currently in the buffer
        while True:
            while pos < len(buf) and buf[pos] in (0x0D, 0x0A):
                pos += 1
            if pos >= len(buf):
                break
            if len(buf) - pos >= 5 and bytes(buf[pos:pos + 5]) != b"WARC/":
                raise ValueError(
                    f"expected WARC record header, got "
                    f"{bytes(buf[pos:pos + 16])!r}")
            end = buf.find(_HDR_END, pos)
            sep = 4
            if end == -1:
                # CRLF headers never contain bare \n\n, so this only
                # fires for LF-only producers, never on a partial block
                end = buf.find(b"\n\n", pos)
                sep = 2
            if end == -1:
                break  # incomplete header block — need more input
            headers = _parse_header_block(bytes(buf[pos:end]))
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    "WARC record missing Content-Length") from None
            body_start = end + sep
            if len(buf) < body_start + length:
                if eof:
                    raise ValueError("truncated WARC payload")
                break  # incomplete payload — need more input
            yield headers, bytes(buf[body_start:body_start + length])
            pos = body_start + length
        if pos:
            del buf[:pos]
            pos = 0
        if eof:
            if buf.strip(b"\r\n"):
                raise ValueError("truncated WARC payload")
            return
        chunk = reader.read(_READ_CHUNK)
        if not chunk:
            eof = True
        else:
            buf += chunk


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
    for headers, payload in iter_warc_records(_warc_reader(data, gzipped)):
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
        # chunked yields: a 1 GiB archive streams out as bounded Arrow
        # batches instead of one giant pandas frame per task
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                gz = str(fpath).endswith(".gz")
                for rec in parse_warc_file(bytes(content), gzipped=gz):
                    if types is None or rec["warc_type"] in types:
                        rows.append(rec)
                    if len(rows) >= 2000:
                        yield pd.DataFrame(rows, columns=_RECORD_COLS)
                        rows = []
            if rows:
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


def read_warc_document_stream(spark, path, max_files_per_trigger: int = 8):
    """Streaming twin of ``warc_documents``: archives landing in
    ``path`` become document micro-batches.

    Composes with ``streaming/incremental.py:start_kg_update_sink`` for
    continuous KG construction straight off a crawl drop directory —
    each micro-batch is one exactly-once absorb commit.  The record
    parse is a stateless ``mapInPandas``, legal on streaming
    DataFrames; ``maxFilesPerTrigger`` bounds a batch to a few archives
    so absorb commits stay right-sized.
    """
    from pyspark.sql import functions as F

    import pandas as pd

    files = (spark.readStream.format("binaryFile")
             # binaryFile's schema is fixed, but streaming sources
             # refuse to infer — spell it out
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("maxFilesPerTrigger", str(max_files_per_trigger))
             .load(path)
             .select("path", "content"))

    def parse(batches):
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                gz = str(fpath).endswith(".gz")
                for rec in parse_warc_file(bytes(content), gzipped=gz):
                    if rec["warc_type"] == "response":
                        rows.append(rec)
                    if len(rows) >= 2000:
                        yield pd.DataFrame(rows, columns=_RECORD_COLS)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=_RECORD_COLS)

    return (files.mapInPandas(parse, schema=WARC_RECORDS_SCHEMA)
            .where(F.col("url").isNotNull())
            .select("url", "warc_ts", "html"))


def write_warc_shards(df, out_dir: str):
    """Distributed WARC export: one ``.warc.gz`` shard per partition.

    The inverse of ``read_warc`` — rows (url, warc_ts, html) leave as
    Common-Crawl-layout archives (member-per-record gzip), written
    executor-side in Arrow batches (no driver collect; a 100 TB corpus
    exports with the same parallelism it scans at).  ``out_dir`` must
    be executor-visible (shared POSIX path here; a production cluster
    would point this at a fuse-mounted object store).  Returns a
    one-row-per-shard DataFrame (shard path, record count) — count it
    to run the export.  Deterministic given the input partitioning
    (records land in partition order, gzip mtime pinned to 0).
    """
    import os

    import pandas as pd
    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    cols = df.select("url", "warc_ts", "html")

    def _write(batches):
        pid = TaskContext.get().partitionId()
        shard = os.path.join(out_dir, f"seg-{pid:05d}.warc.gz")
        n = 0
        with open(shard, "wb") as fh:
            fh.write(gzip.compress(_warcinfo_bytes("engine export"),
                                   mtime=0))
            for pdf in batches:
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"],
                                         pdf["html"]):
                    blob = warc_record_bytes(
                        url, ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                        bytes(html))
                    fh.write(gzip.compress(blob, mtime=0))
                    n += 1
        yield pd.DataFrame({"shard": [shard], "records": [n]})

    return cols.mapInPandas(_write, schema="shard string, records long")


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


def _warcinfo_bytes(software: str) -> bytes:
    return warc_record_bytes(
        url="", date="2026-01-01T00:00:00Z",
        body=(f"software: {software}\r\n").encode(),
        warc_type="warcinfo",
        content_type="application/warc-fields")


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
            fh.write(_compress(_warcinfo_bytes(warcinfo)))
        for rec in records:
            blob = warc_record_bytes(
                url=rec["url"], date=rec["date"], body=rec["body"],
                warc_type=rec.get("warc_type", "response"))
            fh.write(_compress(blob))
