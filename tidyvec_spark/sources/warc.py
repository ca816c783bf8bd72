"""WARC (Web ARChive, ISO 28500) ingestion with malformed-record
quarantine.

Web-scale crawl corpora arrive as WARC files — Common Crawl alone
ships ~64k files per monthly crawl, each a concatenation of length-
delimited records (request/response/metadata), response payloads being
full HTTP messages. The published processing model (sparkcc, Archives
Unleashed) parallelizes BY FILE: every file is one independent parse
task, so a 100 TB crawl is embarrassingly parallel at file granularity
and no record ever spans a task boundary.

This reader follows that shape: ``spark.read.format("binaryFile")``
lists and loads the files (Spark handles listing parallelism,
locality, and partition packing), and an Arrow-batched ``mapInPandas``
walks each file's records — header block to the first CRLFCRLF,
``Content-Length`` payload bytes, CRLFCRLF trailer. A malformed record
(header damage, truncation, a lying Content-Length) becomes ONE
quarantine row and the parser RESYNCS at the next ``WARC/1.`` magic,
so one bad record costs one record, not the file — the same
failure-mode discipline as sources/jsonl.py.

Uncompressed WARC only: per-record gzip members (Common Crawl's wire
format) need a stream-splitting decompressor; the documented posture
is to stage ``.warc`` (or decompress in the loader) — the record
grammar, quarantine, and HTTP-payload split are identical either way.

No reference counterpart (the reference ingests in-memory tibbles,
R/core.R:10); part of the crawl-pipeline extension surface next to
JSONL/CSV/ORC/WebDataset.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["warc_record_bytes", "read_warc", "split_warc_corrupt"]

_MAGIC = b"WARC/1."

WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def warc_record_bytes(
    url: str,
    body: bytes,
    record_id: str,
    warc_type: str = "response",
    http_status: int = 200,
    content_type: str = "text/plain",
) -> bytes:
    """One serialized WARC response record wrapping ``body`` in a
    minimal HTTP message — the writer half used by tests and fixture
    staging (and a valid record per the ISO 28500 grammar this
    module's reader parses)."""
    http = (
        f"HTTP/1.1 {int(http_status)} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii") + body
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <{record_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return head + http + b"\r\n\r\n"


def _parse_http_payload(
    raw: bytes,
) -> Tuple[Optional[int], bytes]:
    """(status, body) from an HTTP message payload; (None, raw) when
    the payload is not an HTTP message (metadata/resource records)."""
    if not raw.startswith(b"HTTP/"):
        return None, raw
    cut = raw.find(b"\r\n\r\n")
    if cut < 0:
        return None, raw
    status_line = raw[: raw.find(b"\r\n")]
    parts = status_line.split(b" ")
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, raw
    return status, raw[cut + 4:]


def _walk_records(path: str, buf: bytes):
    """Yield parsed-record dicts; on any grammar violation emit one
    error row and resync at the next WARC magic."""
    pos = 0
    n = len(buf)
    while pos < n:
        start = buf.find(_MAGIC, pos)
        if start < 0:
            break
        head_end = buf.find(b"\r\n\r\n", start)
        err = None
        headers = {}
        if head_end < 0:
            err = "unterminated header block"
        else:
            for line in buf[start:head_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                if not _:
                    err = f"malformed header line {line[:40]!r}"
                    break
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        clen = headers.get("content-length")
        if err is None and clen is None:
            err = "missing Content-Length"
        if err is None and not clen.isdigit():
            err = f"non-numeric Content-Length {clen!r}"
        if err is None:
            body_start = head_end + 4
            body_end = body_start + int(clen)
            if body_end + 4 > n or buf[body_end:body_end + 4] != b"\r\n\r\n":
                err = "truncated record (Content-Length past trailer)"
        if err is not None:
            nxt = buf.find(_MAGIC, start + 1)
            yield {
                "file": path,
                "record_offset": start,
                "warc_type": headers.get("warc-type"),
                # same spelling law as clean rows (strip <>, empty ->
                # NULL) so quarantine rows join back to re-fetched
                # clean rows on record_id
                "record_id": (
                    headers.get("warc-record-id") or ""
                ).strip("<>")
                or None,
                "target_uri": headers.get("warc-target-uri"),
                "http_status": None,
                "payload": None,
                "error": err,
            }
            pos = nxt if nxt > start else n
            continue
        raw = buf[body_start:body_end]
        status, body = _parse_http_payload(raw)
        yield {
            "file": path,
            "record_offset": start,
            "warc_type": headers.get("warc-type"),
            "record_id": (headers.get("warc-record-id") or "").strip("<>")
            or None,
            "target_uri": headers.get("warc-target-uri"),
            "http_status": status,
            "payload": body,
            "error": None,
        }
        pos = body_end + 4


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse every record of every ``.warc`` file under ``path`` into
    (file, record_offset, warc_type, record_id, target_uri,
    http_status, payload, error). Response payloads are split into
    HTTP status + body; non-HTTP payloads pass through whole.
    Malformed records land as error rows (payload NULL) and parsing
    resyncs at the next record magic — one bad record costs one row.

    Scale shape: one ``binaryFile`` scan (file-granular parallelism,
    the published WARC processing model) + one Arrow-batched
    ``mapInPandas``; zero shuffle. Whole files are held in executor
    memory — the Common Crawl convention of ~1 GB files is the
    intended envelope, matching binaryFile's own contract."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_walk_records(p, bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_SCHEMA.fields],
            )

    return src.select("path", "content").mapInPandas(
        run, schema=WARC_SCHEMA
    )


def split_warc_corrupt(df: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """(clean, quarantine) on the parse-error column — the
    sources/jsonl.py split convention for WARC rows."""
    clean = df.filter(F.col("error").isNull()).drop("error")
    bad = df.filter(F.col("error").isNotNull())
    return clean, bad
