"""WARC sink/source: framing, determinism, round trip, malformed inputs."""

from __future__ import annotations

import gzip

import pytest

from europarl_crawler_spark.operators import warc


def test_record_framing_parses_back():
    rec = warc.response_record("https://a/doc/1", b"hello body")
    parsed = warc.parse_warc(rec)
    assert len(parsed) == 1
    h = parsed[0]["headers"]
    assert h["WARC-Type"] == "response"
    assert h["WARC-Target-URI"] == "https://a/doc/1"
    status, entity = warc.http_payload(parsed[0]["body"])
    assert status == "HTTP/1.1 200 OK"
    assert entity == b"hello body"


def test_record_id_deterministic_and_uuid_shaped():
    a = warc.record_id("https://x/1")
    assert a == warc.record_id("https://x/1")
    assert a != warc.record_id("https://x/2")
    assert a.startswith("urn:uuid:")
    parts = a[len("urn:uuid:"):].split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]


def test_archive_bytes_deterministic():
    recs = warc.warcinfo_record("f.warc.gz") + warc.response_record(
        "https://a/doc/1", "héllo".encode("utf-8")
    )
    assert recs == warc.warcinfo_record("f.warc.gz") + warc.response_record(
        "https://a/doc/1", "héllo".encode("utf-8")
    )
    # gzip member layer is deterministic too (mtime zeroed)
    assert warc._gz_member(recs) == warc._gz_member(recs)


def test_multi_member_gzip_stream_parses():
    blob = warc._gz_member(warc.warcinfo_record("f")) + warc._gz_member(
        warc.response_record("https://a/doc/2", b"x" * 100)
    )
    out = gzip.decompress(blob)  # multi-member transparent
    parsed = warc.parse_warc(out)
    assert [r["headers"]["WARC-Type"] for r in parsed] == ["warcinfo", "response"]


@pytest.mark.parametrize(
    "mangle, msg",
    [
        (lambda b: b[:-2], "terminator"),
        (lambda b: b[: len(b) // 2], None),  # truncated mid-payload
        (lambda b: b.replace(b"WARC/1.1", b"WARC/0.9", 1), "version"),
        (lambda b: b.replace(b"Content-Length", b"X-Length", 1), None),
    ],
)
def test_malformed_records_raise(mangle, msg):
    rec = warc.response_record("https://a/doc/3", b"payload bytes")
    with pytest.raises(ValueError):
        warc.parse_warc(mangle(rec))


def test_http_length_mismatch_raises():
    rec = warc.response_record("https://a/doc/4", b"12345")
    parsed = warc.parse_warc(rec)
    body = parsed[0]["body"].replace(b"Content-Length: 5", b"Content-Length: 9")
    with pytest.raises(ValueError):
        warc.http_payload(body)


def test_export_roundtrip_receipts_match(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text body {i} é", f"src{i % 3}.example") for i in range(40)],
        "doc_id long, text string, source string",
    )
    root = str(tmp_path / "warc")
    wrote = {
        r["shard"]: (r["n_records"], r["url_checksum"], r["payload_checksum"])
        for r in warc.export_warc(docs, root, n_shards=3).collect()
    }
    read = {
        r["shard"]: (r["n_records"], r["url_checksum"], r["payload_checksum"])
        for r in warc.read_warc_manifest(spark, root).collect()
    }
    assert wrote == read
    assert sum(v[0] for v in read.values()) == 40


def test_readback_detects_corruption(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "s.example") for i in range(10)],
        "doc_id long, text string, source string",
    )
    root = tmp_path / "warc"
    warc.export_warc(docs, str(root), n_shards=1).collect()
    path = next(root.glob("crawl-*.warc.gz"))
    blob = gzip.decompress(path.read_bytes())
    # flip one payload byte, rewrite as a single member — parser must object
    # at the WARC layer or the checksum layer must diverge from the source
    idx = blob.rfind(b"t9")
    mangled = blob[:idx] + b"T9" + blob[idx + 2 :]
    path.write_bytes(warc._gz_member(mangled))
    got = warc.read_warc_manifest(spark, str(path.parent)).collect()[0]
    clean = warc.export_warc(docs, str(tmp_path / "w2"), n_shards=1).collect()[0]
    assert got["payload_checksum"] != clean["payload_checksum"]
