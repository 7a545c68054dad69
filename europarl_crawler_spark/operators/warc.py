"""WARC archive sink + source — the crawl-native interchange format.

A web-scale crawler's canonical at-rest format is WARC (ISO 28500 /
WARC 1.1, the format of Common Crawl and the Internet Archive): an
append-only sequence of length-prefixed records, each a full HTTP
exchange plus typed metadata headers, usually stored as a ``.warc.gz``
whose records are INDEPENDENT gzip members so a reader can seek to any
record without decompressing the file prefix. This module writes and
re-reads that format with the same determinism discipline as the
WebDataset exporter (operators/export.py):

- ``export_warc``: hash-sharded (same portable affine shard arithmetic as
  every other export, so membership is a pure function of the id), ONE
  repartition moves each document exactly once, rows sort by id within the
  shard so every archive is byte-deterministic (fixed WARC-Date, zeroed
  gzip mtime, content-derived record ids). Records stream out one at a
  time — a shard never buffers in memory.
- ``read_warc_manifest``: a real record-level parser (header block →
  Content-Length → payload → CRLF CRLF terminator, multi-member gzip) that
  recomputes the per-shard receipt FROM THE BYTES, asserting version line,
  mandatory headers, HTTP status line, and exact record framing — so a
  lost, duplicated, or mangled record anywhere in pack→unpack changes the
  receipt.
- ``warc_manifest_sql``: the DuckDB mirror computed from the SOURCE table.

Reference analog: the reference persists fetched documents as DB rows +
files on disk (europarl/documentdownloader.py writes content to a path);
WARC is what that sink becomes on a fleet crawler, and the per-record
gzip-member layout is what keeps it splittable for the next Spark job.

Scale note (100 TB): one archive per shard and one task per archive on
both write and read; shard count = corpus_bytes / target_archive_bytes is
the caller's policy knob exactly as for parquet/tar shards. Records are
framed by Content-Length, so the reader never scans for separators.
"""

from __future__ import annotations

import gzip
import io
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..functions.porthash import P, poly_hash_py
from . import export as export_ops

CRLF = b"\r\n"
WARC_DATE = "2021-01-01T00:00:00Z"  # fixed archive clock: byte-determinism
SOFTWARE = "europarl-crawler-spark/0.4"

WARC_CHECK_COLS = (
    "shard int, n_records long, url_checksum long, payload_checksum long"
)


def record_id(url: str, date: str = WARC_DATE) -> str:
    """Deterministic ``urn:uuid`` record id: 32 hex digits derived from two
    independent affine members of the portable hash family over (url, date)
    — content-addressed, so re-exporting the same corpus re-creates
    byte-identical archives (the WARC spec only requires global uniqueness
    + URI syntax, not RFC-4122 randomness)."""
    a = poly_hash_py(f"{url}|{date}|a")
    b = poly_hash_py(f"{url}|{date}|b")
    h = f"{a:016x}{b:016x}"
    return f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _headers(fields: list[tuple[str, str]], length: int) -> bytes:
    lines = [b"WARC/1.1"]
    for k, v in fields:
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(f"Content-Length: {length}".encode())
    return CRLF.join(lines) + CRLF + CRLF


def response_record(
    url: str,
    body: bytes,
    content_type: str = "text/plain; charset=utf-8",
    date: str = WARC_DATE,
) -> bytes:
    """One WARC ``response`` record wrapping a minimal HTTP/1.1 200
    response around ``body``. Exact Content-Length framing at both the
    WARC and HTTP layer; record terminator CRLF CRLF per ISO 28500."""
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + f"Content-Type: {content_type}".encode() + CRLF
        + f"Content-Length: {len(body)}".encode() + CRLF + CRLF
        + body
    )
    head = _headers(
        [
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<{record_id(url, date)}>"),
            ("WARC-Date", date),
            ("WARC-Target-URI", url),
            ("Content-Type", "application/http;msgtype=response"),
        ],
        len(http),
    )
    return head + http + CRLF + CRLF


def warcinfo_record(filename: str, date: str = WARC_DATE) -> bytes:
    """The leading ``warcinfo`` record every conformant archive opens with."""
    body = (
        f"software: {SOFTWARE}\r\nformat: WARC File Format 1.1\r\n"
    ).encode("utf-8")
    head = _headers(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<{record_id('warcinfo:' + filename, date)}>"),
            ("WARC-Date", date),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        len(body),
    )
    return head + body + CRLF + CRLF


def _gz_member(record: bytes) -> bytes:
    """Compress one record as an independent gzip member (mtime=0 for
    byte-determinism) — the seekable ``.warc.gz`` layout crawlers ship."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def doc_url(doc_id, source: str) -> str:
    return f"https://{source}/doc/{doc_id}"


DOC_URL_SQL = "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR)"


def export_warc(
    docs: DataFrame,
    root: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Write ``docs`` as ``root/crawl-%05d.warc.gz`` — one archive per hash
    shard, one warcinfo record + one ``response`` record per document (body
    = the document text as a UTF-8 HTTP payload). Returns one receipt row
    per shard: response-record count plus order-insensitive url/payload
    checksums the DuckDB oracle recomputes from the source table."""
    import pandas as pd

    Path(root).mkdir(parents=True, exist_ok=True)
    assigned = export_ops.shard_assign(docs, n_shards, id_col=id_col)
    parts = assigned.repartition(n_shards, "shard").sortWithinPartitions(id_col)
    icol, tcol, scol = id_col, text_col, source_col

    def write(it):
        state: dict[int, dict] = {}
        for pdf in it:
            for sh, did, txt, src in zip(
                pdf["shard"], pdf[icol], pdf[tcol], pdf[scol]
            ):
                st = state.get(int(sh))
                if st is None:
                    name = f"crawl-{int(sh):05d}.warc.gz"
                    fh = open(Path(root) / name, "wb")
                    fh.write(_gz_member(warcinfo_record(name)))
                    st = state[int(sh)] = {"fh": fh, "n": 0, "uc": 0, "pc": 0}
                url = doc_url(did, str(src))
                txt = str(txt)
                st["fh"].write(
                    _gz_member(response_record(url, txt.encode("utf-8")))
                )
                st["n"] += 1
                st["uc"] = (st["uc"] + poly_hash_py(url)) % P
                st["pc"] = (st["pc"] + poly_hash_py(txt)) % P
        rows = []
        for sh, st in sorted(state.items()):
            st["fh"].close()
            rows.append((sh, st["n"], st["uc"], st["pc"]))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["shard", "n_records", "url_checksum", "payload_checksum"],
            )

    return parts.mapInPandas(write, schema=WARC_CHECK_COLS)


def parse_warc(blob: bytes) -> list[dict]:
    """Parse a decompressed WARC byte stream into records — real framing:
    header block to the blank line, exact Content-Length payload, CRLF CRLF
    terminator. Raises on any violation (bad version line, missing
    mandatory header, short payload, missing terminator)."""
    records = []
    pos = 0
    n = len(blob)
    while pos < n:
        end = blob.find(CRLF + CRLF, pos)
        if end < 0:
            raise ValueError("warc: unterminated header block")
        head = blob[pos:end].decode("utf-8")
        lines = head.split("\r\n")
        if lines[0] != "WARC/1.1":
            raise ValueError(f"warc: bad version line {lines[0]!r}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip()] = v.strip()
        for req in ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length"):
            if req not in hdrs:
                raise ValueError(f"warc: missing header {req}")
        length = int(hdrs["Content-Length"])
        body_at = end + 4
        body = blob[body_at : body_at + length]
        if len(body) != length:
            raise ValueError("warc: truncated record payload")
        if blob[body_at + length : body_at + length + 4] != CRLF + CRLF:
            raise ValueError("warc: missing record terminator")
        records.append({"headers": hdrs, "body": body})
        pos = body_at + length + 4
    return records


def http_payload(body: bytes) -> tuple[str, bytes]:
    """Split a ``response`` record body into (status line, entity bytes),
    verifying the HTTP Content-Length framing."""
    end = body.find(CRLF + CRLF)
    if end < 0:
        raise ValueError("warc: response without HTTP header block")
    head = body[:end].decode("utf-8").split("\r\n")
    m = re.match(r"HTTP/1\.[01] (\d{3}) ", head[0] + " ")
    if not m:
        raise ValueError(f"warc: bad status line {head[0]!r}")
    clen = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-length":
            clen = int(v.strip())
    entity = body[end + 4 :]
    if clen is not None and clen != len(entity):
        raise ValueError("warc: HTTP Content-Length mismatch")
    return head[0], entity


def read_warc_manifest(spark: SparkSession, root: str) -> DataFrame:
    """Re-read the WRITTEN archives and recompute the receipt from the
    bytes — one task per archive. Asserts: leading warcinfo record, every
    other record a well-framed ``response`` with a valid HTTP payload and a
    WARC-Target-URI; checksums recomputed from the parsed url + entity."""
    import pandas as pd

    paths = sorted(str(p) for p in Path(root).glob("crawl-*.warc.gz"))
    pdf_paths = spark.createDataFrame([(p,) for p in paths], "path string")

    def readback(it):
        for pdf in it:
            rows = []
            for p in pdf["path"]:
                shard = int(re.search(r"crawl-(\d+)\.warc\.gz$", p).group(1))
                with gzip.open(p, "rb") as fh:  # multi-member transparent
                    blob = fh.read()
                recs = parse_warc(blob)
                if not recs or recs[0]["headers"]["WARC-Type"] != "warcinfo":
                    raise ValueError(f"warc: {p} does not open with warcinfo")
                n = uc = pc = 0
                for r in recs[1:]:
                    h = r["headers"]
                    if h["WARC-Type"] != "response":
                        raise ValueError(f"warc: unexpected type {h['WARC-Type']}")
                    status, entity = http_payload(r["body"])
                    if not status.endswith("200 OK"):
                        raise ValueError(f"warc: bad status {status!r}")
                    n += 1
                    uc = (uc + poly_hash_py(h["WARC-Target-URI"])) % P
                    pc = (pc + poly_hash_py(entity.decode("utf-8"))) % P
                rows.append((shard, n, uc, pc))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["shard", "n_records", "url_checksum", "payload_checksum"],
                )

    return pdf_paths.repartition(max(len(paths), 1)).mapInPandas(
        readback, schema=WARC_CHECK_COLS
    )


def warc_manifest_sql(n_shards: int, table: str = "documents") -> str:
    """DuckDB mirror of the WARC receipt computed from the SOURCE table."""
    from ..functions.porthash import poly_hash_sql

    uh = poly_hash_sql(DOC_URL_SQL)
    ph = poly_hash_sql("text")
    return (
        f"SELECT {export_ops.shard_assign_sql(n_shards)} AS shard, "
        f"COUNT(*) AS n_records, "
        f"CAST(SUM({uh}) % {P} AS BIGINT) AS url_checksum, "
        f"CAST(SUM({ph}) % {P} AS BIGINT) AS payload_checksum "
        f"FROM {table} GROUP BY 1"
    )
