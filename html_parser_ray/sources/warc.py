"""WARC (ISO 28500 / WARC/1.0) source: read Common-Crawl-style web
archives into a Ray Dataset of (warc_file, url, warc_date, html) rows.

From-scratch stdlib implementation (no warcio in this container):
  * plain concatenated WARC records, and
  * the standard CC layout of per-record gzip members (each record its
    own gzip stream, members concatenated) — sniffed by magic bytes,
    decompressed member-wise with zlib(wbits=31) via unused_data.

Record model: ``WARC/1.0\\r\\n`` + headers + blank line + block of
``Content-Length`` bytes + ``\\r\\n\\r\\n``. For ``WARC-Type: response``
records whose block is an HTTP response, the HTTP status line/headers
are split off at the first blank line and the body returned as the
payload. Malformed records are yielded as status="error" rows (per-record
quarantine, same contract as the extract stages) — a torn record never
fails the file.

Scale shape: `ray.data.read_binary_files` gives one block per WARC file
— the standard unit of CC processing (~1 GB/file) — and record explosion
happens inside `map_batches` on the worker that read the file; bytes
never move twice. For bigger-than-memory single files a streaming
datasource would replace the in-memory split (documented trade; CC
shards are sized to fit).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# writer (deterministic — used by tests, the oracle corpus, and sinks)

def make_warc_record(url: str, date: str, body: bytes,
                     content_type: str = "text/html",
                     http: bool = True) -> bytes:
    """One WARC/1.0 response record. ``date`` must be an ISO-8601 string
    (deterministic inputs only — never wall-clock)."""
    if http:
        block = (b"HTTP/1.1 200 OK\r\nContent-Type: "
                 + content_type.encode("ascii")
                 + b"\r\nContent-Length: " + str(len(body)).encode("ascii")
                 + b"\r\n\r\n" + body)
        block_type = b'application/http; msgtype=response'
    else:
        block = body
        block_type = content_type.encode("ascii")
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8") + CRLF
            + b"WARC-Date: " + date.encode("ascii") + CRLF
            + b"Content-Type: " + block_type + CRLF
            + b"Content-Length: " + str(len(block)).encode("ascii") + CRLF
            + CRLF)
    return head + block + CRLF + CRLF


def make_warc(records: list[tuple[str, str, bytes]],
              gzip_members: bool = False) -> bytes:
    """Concatenate (url, date, body) into a WARC file — optionally the
    CC-standard one-gzip-member-per-record layout."""
    out = []
    for url, date, body in records:
        rec = make_warc_record(url, date, body)
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


# ---------------------------------------------------------------------------
# reader

def _gunzip_members(data: bytes):
    """Yield (decompressed_member | None, error | None) per gzip member
    of a concatenated-members stream.

    The per-member input is a zero-copy memoryview slice — a bytes
    slice here copied the whole remaining tail once per member, i.e.
    O(file²) memcpy on CC's one-member-per-record layout (terabytes of
    copying for a ~1 GB archive). A corrupt member yields ONE error
    tuple and RESYNCS at the next gzip magic, so one torn member never
    discards the rest of the archive's independently-valid members."""
    view = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(view[pos:])
        except zlib.error as exc:
            yield None, f"gzip member at byte {pos}: {exc}"
            nxt = data.find(_GZ_MAGIC + b"\x08", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        yield chunk, None
        tail = d.unused_data
        if not tail:
            break
        pos = n - len(tail)


def _split_records(data: bytes):
    """Yield raw (headers_bytes, block_bytes) per WARC record."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header")
        headers = data[pos:hdr_end]
        if not headers.startswith(b"WARC/"):
            raise ValueError("missing WARC/ magic")
        length = None
        for line in headers.split(CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                length = int(v.strip())
        if length is None:
            raise ValueError("record without Content-Length")
        if length < 0:
            # a negative length would move `pos` backwards — loop forever
            raise ValueError("negative Content-Length")
        block_start = hdr_end + 4
        if block_start + length > n:
            raise ValueError("truncated WARC block")
        yield headers, data[block_start:block_start + length]
        pos = block_start + length


def parse_warc(data: bytes) -> list[dict]:
    """bytes of one WARC file (plain or gzip-membered) → list of
    {url, warc_date, warc_type, payload: bytes, status, error}."""
    chunks = (_gunzip_members(data) if data[:2] == _GZ_MAGIC
              else iter([(data, None)]))
    rows: list[dict] = []
    for chunk, gz_err in chunks:
        if gz_err is not None:
            # per-member quarantine: record the torn member, keep
            # reading the members after the resync point
            rows.append({"url": "", "warc_date": "", "warc_type": "",
                         "payload": b"", "status": "error",
                         "error": f"gzip: {gz_err}"})
            continue
        try:
            for headers, block in _split_records(chunk):
                row = {"url": "", "warc_date": "", "warc_type": "",
                       "payload": b"", "status": "ok", "error": ""}
                is_http = False
                for line in headers.split(CRLF)[1:]:
                    k, _, v = line.partition(b":")
                    key = k.strip().lower()
                    val = v.strip()
                    if key == b"warc-target-uri":
                        row["url"] = val.decode("utf-8", "replace")
                    elif key == b"warc-date":
                        row["warc_date"] = val.decode("ascii", "replace")
                    elif key == b"warc-type":
                        row["warc_type"] = val.decode("ascii", "replace")
                    elif key == b"content-type" \
                            and val.startswith(b"application/http"):
                        is_http = True
                if is_http:
                    split = block.find(b"\r\n\r\n")
                    row["payload"] = block[split + 4:] if split >= 0 \
                        else block
                else:
                    row["payload"] = block
                rows.append(row)
        except ValueError as exc:
            rows.append({"url": "", "warc_date": "", "warc_type": "",
                         "payload": b"", "status": "error",
                         "error": str(exc)})
    return rows


def _explode_batch(batch: pa.Table) -> pa.Table:
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    cols = {"warc_file": [], "url": [], "warc_date": [], "warc_type": [],
            "payload": [], "status": [], "error": []}
    for path, blob in zip(paths, blobs):
        for row in parse_warc(blob):
            cols["warc_file"].append(path)
            for k in ("url", "warc_date", "warc_type", "payload",
                      "status", "error"):
                cols[k].append(row[k])
    return pa.table({
        "warc_file": pa.array(cols["warc_file"], pa.string()),
        "url": pa.array(cols["url"], pa.string()),
        "warc_date": pa.array(cols["warc_date"], pa.string()),
        "warc_type": pa.array(cols["warc_type"], pa.string()),
        "payload": pa.array(cols["payload"], pa.binary()),
        "status": pa.array(cols["status"], pa.string()),
        "error": pa.array(cols["error"], pa.string()),
    })


def read_warc(paths, **read_kwargs):
    """Directory / file list of .warc / .warc.gz → Dataset[warc_file,
    url, warc_date, warc_type, payload, status, error]. One input file
    per block (`read_binary_files` with paths included); records explode
    on the reading worker."""
    import ray

    files = ray.data.read_binary_files(paths, include_paths=True,
                                       **read_kwargs)
    return files.map_batches(_explode_batch, batch_format="pyarrow",
                             batch_size=1)
