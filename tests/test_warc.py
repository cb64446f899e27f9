"""WARC source round-trip and robustness tests (sources/warc.py)."""

import pyarrow as pa
import pytest

from html_parser_ray.sources.warc import (
    make_warc, make_warc_record, parse_warc, read_warc)

DATE = "2024-01-01T00:00:00Z"


def test_roundtrip_plain():
    recs = [("http://a/1", DATE, b"hello world"),
            ("http://a/2", DATE, b"<html><p>x</p></html>")]
    rows = parse_warc(make_warc(recs))
    assert [r["url"] for r in rows] == ["http://a/1", "http://a/2"]
    assert [r["payload"] for r in rows] == [b"hello world",
                                            b"<html><p>x</p></html>"]
    assert all(r["status"] == "ok" for r in rows)
    assert all(r["warc_type"] == "response" for r in rows)
    assert all(r["warc_date"] == DATE for r in rows)


def test_roundtrip_gzip_members():
    recs = [(f"http://b/{i}", DATE, f"body {i}".encode() * 50)
            for i in range(5)]
    data = make_warc(recs, gzip_members=True)
    assert data[:2] == b"\x1f\x8b"
    rows = parse_warc(data)
    assert len(rows) == 5
    assert rows[3]["payload"] == b"body 3" * 50


def test_payload_with_crlf_and_binary():
    body = b"line1\r\n\r\nline2\x00\xff" + b"\r\n\r\n" + b"tail"
    rows = parse_warc(make_warc([("http://c", DATE, body)]))
    assert rows[0]["payload"] == body      # Content-Length framing, not split


def test_non_http_record_block_is_payload():
    rec = make_warc_record("http://d", DATE, b"raw-bytes", http=False,
                           content_type="application/octet-stream")
    rows = parse_warc(rec)
    assert rows[0]["payload"] == b"raw-bytes"


def test_truncated_block_quarantined():
    rec = make_warc_record("http://e", DATE, b"full body here")
    rows = parse_warc(rec[:-10])           # cut into the block
    assert rows[0]["status"] == "error"
    assert "truncated" in rows[0]["error"]


def test_garbage_prefix_quarantined():
    rows = parse_warc(b"NOT-A-WARC\r\n\r\nstuff")
    assert rows[0]["status"] == "error"


def test_empty_body_and_unicode_url():
    rows = parse_warc(make_warc([("http://f/é", DATE, b"")]))
    assert rows[0]["url"] == "http://f/é"
    assert rows[0]["payload"] == b""


def test_read_warc_dataset(ray_session, tmp_path):
    recs_a = [(f"doc://{i}", DATE, f"text {i}".encode()) for i in range(10)]
    recs_b = [(f"doc://{i}", DATE, f"text {i}".encode())
              for i in range(10, 25)]
    (tmp_path / "a.warc").write_bytes(make_warc(recs_a))
    (tmp_path / "b.warc.gz").write_bytes(make_warc(recs_b,
                                                   gzip_members=True))
    ds = read_warc(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 25
    by_url = {r["url"]: r for r in rows}
    assert by_url["doc://7"]["payload"] == b"text 7"
    assert by_url["doc://20"]["payload"] == b"text 20"
    assert by_url["doc://20"]["warc_file"].endswith("b.warc.gz")
    assert all(r["status"] == "ok" for r in rows)


def test_negative_content_length_quarantined():
    # r3 review fix: a negative Content-Length must not move the cursor
    # backwards (infinite loop) — it quarantines the file tail instead.
    import re
    rec = make_warc_record("http://g", DATE, b"body")
    bad = re.sub(rb"Content-Length: (\d+)\r\n\r\n",
                 rb"Content-Length: -\1\r\n\r\n", rec, count=1)
    assert bad != rec
    rows = parse_warc(bad)
    assert rows[0]["status"] == "error"
    assert "negative" in rows[0]["error"]


def test_corrupt_gzip_member_quarantined():
    # r3 review fix: zlib.error from a torn/corrupt gzip member must
    # yield an error row, not escape and kill the read task.
    recs = [("http://h/1", DATE, b"good body")]
    data = make_warc(recs, gzip_members=True) + b"GARBAGE-NOT-GZIP"
    rows = parse_warc(data)
    assert rows[0]["status"] == "ok"
    assert rows[0]["payload"] == b"good body"
    assert rows[-1]["status"] == "error"
    assert "gzip" in rows[-1]["error"]

    # entirely-corrupt gzip stream (magic bytes then junk)
    rows2 = parse_warc(b"\x1f\x8bjunkjunkjunk")
    assert len(rows2) == 1 and rows2[0]["status"] == "error"
