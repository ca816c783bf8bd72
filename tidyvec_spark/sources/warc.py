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

Both wire formats: uncompressed ``.warc`` AND ``.warc.gz`` — Common
Crawl's actual format, a concatenation of per-record gzip MEMBERS
(one member = one record, so members are independently seekable).
Compression is detected per file from the gzip magic, not the
filename; ``.warc.gz`` members are split and decompressed ONE AT A
TIME inside the same ``mapInPandas`` (``zlib.decompressobj`` fed in
bounded chunks), so peak task memory is the compressed file (which
``binaryFile`` materializes regardless) plus ONE decompressed record
— never the whole decompressed file, which runs 3-5× the compressed
size on web text. A corrupt or truncated member becomes one
quarantine row and the splitter resyncs at the next gzip magic — the
same one-bad-record-costs-one-record law as the record grammar.

No reference counterpart (the reference ingests in-memory tibbles,
R/core.R:10); part of the crawl-pipeline extension surface next to
JSONL/CSV/ORC/WebDataset.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "warc_record_bytes",
    "warc_gz_bytes",
    "read_warc",
    "split_warc_corrupt",
]

_MAGIC = b"WARC/1."
_GZ_MAGIC = b"\x1f\x8b"
# chunk size for the incremental gzip-member decompressor: bounds the
# tail copy zlib keeps in unused_data at a member boundary
_GZ_CHUNK = 1 << 20

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
    module's reader parses). Headers are encoded utf-8 (real crawl
    URIs are utf-8; the reader's latin-1 header decode resyncs on the
    CRLF/colon structure, which utf-8 never disturbs)."""
    http = (
        f"HTTP/1.1 {int(http_status)} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("utf-8") + body
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <{record_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return head + http + b"\r\n\r\n"


def warc_gz_bytes(records) -> bytes:
    """Serialize records as a ``.warc.gz`` byte stream: each record
    (already-serialized WARC bytes, e.g. from :func:`warc_record_bytes`)
    becomes its OWN gzip member — Common Crawl's wire format, which is
    what makes members independently seekable and the reader's
    member-at-a-time decompression possible."""
    import gzip

    return b"".join(gzip.compress(r, compresslevel=6) for r in records)


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


def _hdec(b: bytes) -> str:
    """Header-value decode: utf-8 (the WARC/1.0 header charset, so
    non-ASCII target URIs round-trip) with latin-1 fallback (never
    raises — a mis-encoded header must quarantine its record, not
    kill the task)."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _walk_records(path: str, buf: bytes, base_offset: int = 0):
    """Yield parsed-record dicts; on any grammar violation emit one
    error row and resync at the next WARC magic. ``base_offset`` is
    added to every record_offset — the gz path passes the member's
    offset in the COMPRESSED file (the Common Crawl offset
    convention), the plain path passes 0."""
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
                headers[k.strip().lower().decode("latin-1")] = _hdec(
                    v.strip()
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
                "record_offset": base_offset + start,
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
            "record_offset": base_offset + start,
            "warc_type": headers.get("warc-type"),
            "record_id": (headers.get("warc-record-id") or "").strip("<>")
            or None,
            "target_uri": headers.get("warc-target-uri"),
            "http_status": status,
            "payload": body,
            "error": None,
        }
        pos = body_end + 4


def _quarantine_row(path: str, offset: int, err: str) -> dict:
    return {
        "file": path,
        "record_offset": offset,
        "warc_type": None,
        "record_id": None,
        "target_uri": None,
        "http_status": None,
        "payload": None,
        "error": err,
    }


def _walk_gz_records(path: str, buf: bytes):
    """Yield parsed-record dicts from a ``.warc.gz`` file: split the
    concatenated per-record gzip members and run the record grammar on
    each member's decompressed bytes, ONE member at a time.

    Memory bound: the decompressor is fed ``_GZ_CHUNK``-sized
    memoryview slices (zero-copy over the file bytes ``binaryFile``
    already holds), so peak extra memory per task is one decompressed
    member (= one record, a few MB on web text) + one chunk — NOT the
    whole decompressed file, which is 3-5× the compressed size. A
    corrupt or truncated member yields one quarantine row and the
    splitter resyncs at the next gzip magic; non-gzip garbage between
    members is quarantined the same way. ``record_offset`` is the
    member's byte offset in the COMPRESSED file (the Common Crawl
    seekability convention); records past the first inside a
    multi-record member (non-standard but legal) offset from there."""
    import zlib

    mv = memoryview(buf)
    n = len(buf)
    cpos = 0
    while cpos < n:
        if buf[cpos:cpos + 2] != _GZ_MAGIC:
            nxt = buf.find(_GZ_MAGIC, cpos + 1)
            yield _quarantine_row(
                path, cpos, "non-gzip bytes where a member should start"
            )
            if nxt < 0:
                return
            cpos = nxt
            continue
        d = zlib.decompressobj(31)
        parts = []
        p = cpos
        err = None
        while p < n and not d.eof:
            end = min(p + _GZ_CHUNK, n)
            try:
                parts.append(d.decompress(mv[p:end]))
            except zlib.error as e:
                err = f"corrupt gzip member: {e}"
                break
            p = end
        if err is not None:
            yield _quarantine_row(path, cpos, err)
            nxt = buf.find(_GZ_MAGIC, cpos + 2)
            if nxt < 0:
                return
            cpos = nxt
            continue
        if not d.eof:
            yield _quarantine_row(
                path, cpos, "truncated gzip member (EOF mid-stream)"
            )
            return
        consumed = (p - cpos) - len(d.unused_data)
        yield from _walk_records(path, b"".join(parts), base_offset=cpos)
        cpos += max(consumed, 1)


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.{warc,warc.gz,warc.wet.gz,warc.wat.gz}",
) -> DataFrame:
    """Parse every record of every WARC-family file under ``path``
    (filename filter = ``glob``, a Hadoop glob passed as
    ``pathGlobFilter`` so stray non-WARC files are never loaded; the
    default covers the Common Crawl family — ``.warc``, ``.warc.gz``,
    and the extracted-text/metadata ``.warc.wet.gz`` /
    ``.warc.wat.gz`` sidecar names. NOTE: before the glob existed this
    reader loaded EVERY file under ``path``; extensionless or
    unconventionally-named archives now need an explicit ``glob=`` —
    compression is still detected from magic bytes, never the name)
    into
    (file, record_offset, warc_type, record_id, target_uri,
    http_status, payload, error). Response payloads are split into
    HTTP status + body; non-HTTP payloads pass through whole.
    Malformed records land as error rows (payload NULL) and parsing
    resyncs at the next record magic — one bad record costs one row.
    Compression is detected per file from the gzip magic bytes, not
    the filename, so a mixed directory parses correctly.

    Scale shape: one ``binaryFile`` scan (file-granular parallelism,
    the published WARC processing model) + one Arrow-batched
    ``mapInPandas``; zero shuffle. Peak task memory = one compressed
    file (the binaryFile contract; ~1 GB by Common Crawl convention)
    + for ``.warc.gz`` one decompressed MEMBER at a time (see
    :func:`_walk_gz_records`) — never a whole decompressed file."""
    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )

    def run(batches) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                walk = (
                    _walk_gz_records
                    if blob[:2] == _GZ_MAGIC
                    else _walk_records
                )
                rows.extend(walk(p, blob))
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
