"""Multimodal columns: image / audio / video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no codec libraries (no PIL / torchaudio / ffmpeg), so the
DECODE step is gated behind an import-try: with a real library present the
stage decodes real bytes; otherwise it falls back to the deterministic FAKE
container format below (or raises NotImplementedError for foreign bytes).
The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested; only the codec call is stubbed.

FAKE container format (deterministic, self-describing):
  b"FAKEIMG1" + u16 width + u16 height + u8 channels + pixel bytes
  b"FAKEAUD1" + u32 sample_rate + u32 n_samples + i16 samples
  b"FAKEVID1" + u16 width + u16 height + u16 n_frames + frame bytes

Payloads are multi-KB binary cells: batch_size for these stages must be
sized in BYTES not rows (see media_pool), exactly the discipline a real
100 TB image corpus needs.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("source_url", pa.string()),
])

try:  # real codec path — absent in this container, used when available
    from PIL import Image as _PIL_Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# ---------------------------------------------------------------------------
# deterministic synthetic media (no external data; seeded by id)

def encode_png(arr: "np.ndarray") -> bytes:
    """Minimal deterministic PNG encoder (filter 0, 8-bit RGB) — the
    write half of the PNG bridge, used to synthesize real-format test
    payloads for decode_png."""
    import zlib

    h, w, c = arr.shape
    assert c == 3
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def make_image_payload(media_id: int) -> bytes:
    """Deterministic image payload; the format rotates by id so every
    third image exercises a REAL codec end to end (FAKEIMG1 container /
    baseline JPEG via jpegcore / PNG via the bridge pair), same dims
    formula for all three so dimension oracles hold."""
    width = 16 + (media_id * 7) % 48
    height = 16 + (media_id * 13) % 48
    channels = 3
    n = width * height * channels
    seed = hashlib.blake2b(struct.pack("<q", media_id),
                           digest_size=8).digest()
    reps = n // 8 + 1
    pixels = (seed * reps)[:n]
    form = media_id % 3
    if form == 1:
        from .jpegcore import encode_jpeg_baseline
        arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
        return encode_jpeg_baseline(
            arr, quality=90,
            subsampling="4:2:0" if media_id % 2 == 0 else "4:4:4")
    if form == 2:
        arr = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
        return encode_png(arr)
    return b"FAKEIMG1" + struct.pack("<HHB", width, height, channels) + pixels


def make_audio_payload(media_id: int) -> bytes:
    sample_rate = 16_000
    n_samples = 1024 + (media_id * 31) % 2048
    t = np.arange(n_samples, dtype=np.float64)
    freq = 110.0 + (media_id % 40) * 11.0
    wave = (np.sin(2 * np.pi * freq * t / sample_rate) * 12_000).astype("<i2")
    return (b"FAKEAUD1" + struct.pack("<II", sample_rate, n_samples)
            + wave.tobytes())


def make_video_payload(media_id: int) -> bytes:
    width, height = 32, 24
    n_frames = 8 + (media_id * 3) % 24
    frame = hashlib.blake2b(struct.pack("<q", media_id),
                            digest_size=16).digest()
    reps = (width * height) // 16 + 1
    frames = ((frame * reps)[:width * height]) * n_frames
    return (b"FAKEVID1" + struct.pack("<HHH", width, height, n_frames)
            + frames)


def media_table(n_rows: int, start: int = 0) -> pa.Table:
    kinds = ("image", "audio", "video")
    makers = (make_image_payload, make_audio_payload, make_video_payload)
    ids, kind_col, payloads, urls = [], [], [], []
    for i in range(start, start + n_rows):
        k = i % 3
        ids.append(i)
        kind_col.append(kinds[k])
        payloads.append(makers[k](i))
        urls.append(f"https://example.org/media/{i:08d}.{kinds[k][:3]}")
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "kind": pa.array(kind_col, pa.string()),
                     "payload": pa.array(payloads, pa.binary()),
                     "source_url": pa.array(urls, pa.string())},
                    schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode kernels (codec boundary — the only partially-stubbed part:
# PNG decodes for real via the from-scratch decoder below and baseline
# JPEG via stages/jpegcore.py; WebP/GIF/… would use PIL when present
# and raise otherwise)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, height: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Undo PNG per-scanline filtering (spec filters 0-4: None, Sub, Up,
    Average, Paeth — public PNG spec §9). Sequential by construction
    (each row depends on the previous); rows are small, this is the
    bridge path, not the 100-TB hot path."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ftype == 1:                          # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:                        # Up
            row = (row + prev) & 0xFF
        elif ftype == 3:                        # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:                        # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: bad filter type {ftype}")
        out[y] = row
        prev = row
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Minimal from-scratch PNG decoder (public spec, stdlib zlib):
    8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA), no interlace.
    Returns (width, height, 3, HxWx3 uint8) — gray is expanded and
    alpha dropped so the feature stage sees one layout. Written for the
    FAKE→real decode bridge; a production image corpus would swap in a
    turbo codec behind the same signature."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    width = height = depth = color = interlace = None
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                       # 4 len + 4 type + 4 crc
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("PNG: truncated IHDR")
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            f"PNG bridge decoder: unsupported depth={depth} "
            f"color={color} interlace={interlace}")
    if width == 0 or height == 0:
        raise ValueError("degenerate PNG dims")
    if width * height > 64_000_000:     # match the JPEG bridge cap
        raise ValueError("PNG: dimensions exceed bridge-decoder cap")
    channels = {0: 1, 2: 3, 6: 4}[color]
    stride = width * channels
    expected = height * (stride + 1)
    try:
        # bounded decompress: a crafted IDAT must not expand past the
        # declared pixel volume (zip-bomb guard)
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected)
    except zlib.error as exc:
        raise ValueError(f"PNG: corrupt IDAT ({exc})") from None
    if len(raw) != expected:
        raise ValueError("PNG: truncated pixel data")
    arr = _png_unfilter(raw, height, stride, channels) \
        .reshape(height, width, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels == 4:
        arr = arr[:, :, :3]
    return width, height, 3, np.ascontiguousarray(arr)


def _decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload.startswith(b"FAKEIMG1"):
        width, height, channels = struct.unpack_from("<HHB", payload, 8)
        # degenerate dims are a torn/crafted payload: fail INSIDE the
        # quarantine guard — the feature/resize math downstream is
        # deliberately unguarded and assumes a non-empty image
        if width <= 0 or height <= 0 or channels <= 0:
            raise ValueError(
                f"degenerate image dims {width}x{height}x{channels}")
        # (np.frombuffer raises ValueError on truncated pixel data —
        # also inside the guard)
        pixels = np.frombuffer(payload, dtype=np.uint8, offset=13,
                               count=width * height * channels)
        return width, height, channels, pixels.reshape(height, width, channels)
    if payload.startswith(_PNG_MAGIC):
        return decode_png(payload)               # real decode, no deps
    if payload.startswith(b"\xff\xd8"):          # real decode, no deps
        from .jpegcore import decode_jpeg
        return decode_jpeg(payload)
    if _HAVE_PIL:  # pragma: no cover — no PIL in this container
        import io
        img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")
        arr = np.asarray(img)
        return img.width, img.height, 3, arr
    raise NotImplementedError(
        "no codec for this image format in this container (PNG and "
        "baseline JPEG decode via the built-in from-scratch decoders; "
        "WebP/GIF/... need PIL)")


def _decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload.startswith(b"FAKEAUD1"):
        sample_rate, n_samples = struct.unpack_from("<II", payload, 8)
        samples = np.frombuffer(payload, dtype="<i2", offset=16,
                                count=n_samples)
        return sample_rate, samples
    raise NotImplementedError("real audio codecs unavailable; FAKEAUD1 only")


def _decode_video(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload.startswith(b"FAKEVID1"):
        width, height, n_frames = struct.unpack_from("<HHH", payload, 8)
        return width, height, n_frames, payload[14:]
    raise NotImplementedError("real video codecs unavailable; FAKEVID1 only")


# ---------------------------------------------------------------------------
# actor stages

class ImageFeatureStage:
    """media(image) → (media_id, width, height, channels, mean_luma_bp,
    phash) — decode + feature-extract, one row per image."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": [], "width": [], "height": [], "channels": [],
               "mean_luma_bp": [], "phash": [], "status": []}
        for mid, payload in zip(ids, payloads):
            # only the DECODE is quarantine-guarded — corrupt/torn
            # payloads are normal in a crawl and quarantine the ROW; a
            # failure in the feature math below would be a code bug and
            # must stay loud, not masquerade as decode_error
            try:
                w, h, c, arr = _decode_image(payload)
            except NotImplementedError:
                out["media_id"].append(mid)
                out["width"].append(0)
                out["height"].append(0)
                out["channels"].append(0)
                out["mean_luma_bp"].append(0)
                out["phash"].append(0)
                out["status"].append("codec_unavailable")
                continue
            except Exception:
                out["media_id"].append(mid)
                out["width"].append(0)
                out["height"].append(0)
                out["channels"].append(0)
                out["mean_luma_bp"].append(0)
                out["phash"].append(0)
                out["status"].append("decode_error")
                continue
            luma = float(arr.astype(np.float64).mean()) / 255.0
            # 64-bit average-hash over an 8x8 downsample (public aHash)
            gray = arr.mean(axis=2)
            ys = np.linspace(0, h - 1, 8).astype(int)
            xs = np.linspace(0, w - 1, 8).astype(int)
            small = gray[np.ix_(ys, xs)]
            bits = (small > small.mean()).flatten()
            phash = 0
            for i, b in enumerate(bits):
                if b:
                    phash |= 1 << i
            out["media_id"].append(mid)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["mean_luma_bp"].append(int(round(luma * 10_000)))
            out["phash"].append(phash & ((1 << 63) - 1))
            out["status"].append("ok")
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "channels": pa.array(out["channels"], pa.int64()),
            "mean_luma_bp": pa.array(out["mean_luma_bp"], pa.int64()),
            "phash": pa.array(out["phash"], pa.int64()),
            "status": pa.array(out["status"], pa.string()),
        })


class ImageResizeStage:
    """media(image) → re-encoded FAKEIMG1 payload at target size
    (nearest-neighbor; a real deployment swaps the codec call only)."""

    def __init__(self, target_width: int = 16, target_height: int = 16):
        self.tw = target_width
        self.th = target_height

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids, out_payloads, status = [], [], []
        for mid, payload in zip(ids, payloads):
            try:   # decode-only guard (see ImageFeatureStage)
                w, h, c, arr = _decode_image(payload)
            except NotImplementedError:
                out_ids.append(mid)
                out_payloads.append(b"")
                status.append("codec_unavailable")
                continue
            except Exception:
                out_ids.append(mid)
                out_payloads.append(b"")
                status.append("decode_error")
                continue
            ys = np.linspace(0, h - 1, self.th).astype(int)
            xs = np.linspace(0, w - 1, self.tw).astype(int)
            small = arr[np.ix_(ys, xs)]
            out_ids.append(mid)
            out_payloads.append(
                b"FAKEIMG1" + struct.pack("<HHB", self.tw, self.th, c)
                + small.tobytes())
            status.append("ok")
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "payload": pa.array(out_payloads, pa.binary()),
            "width": pa.array([self.tw] * len(out_ids), pa.int64()),
            "height": pa.array([self.th] * len(out_ids), pa.int64()),
            "status": pa.array(status, pa.string()),
        })


class AudioFeatureStage:
    """media(audio) → (media_id, sample_rate, n_samples, duration_ms,
    rms_bp, zero_crossings)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = {"media_id": [], "sample_rate": [], "n_samples": [],
               "duration_ms": [], "rms_bp": [], "zero_crossings": [],
               "status": []}
        for mid, payload in zip(ids, payloads):
            try:
                rate, samples = _decode_audio(payload)
                f = samples.astype(np.float64) / 32768.0
                rms = float(np.sqrt((f * f).mean())) if len(f) else 0.0
                zc = int(((f[:-1] * f[1:]) < 0).sum()) if len(f) > 1 else 0
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(samples))
                out["duration_ms"].append(int(len(samples) * 1000 / rate))
                out["rms_bp"].append(int(round(rms * 10_000)))
                out["zero_crossings"].append(zc)
                out["status"].append("ok")
            except NotImplementedError:
                out["media_id"].append(mid)
                out["sample_rate"].append(0)
                out["n_samples"].append(0)
                out["duration_ms"].append(0)
                out["rms_bp"].append(0)
                out["zero_crossings"].append(0)
                out["status"].append("codec_unavailable")
        return pa.table({k: pa.array(v, pa.int64() if k != "status"
                                     else pa.string())
                         for k, v in out.items()})


class VideoFrameSampleStage:
    """media(video) → one row per sampled frame (every ``stride``-th),
    frame re-encoded as a FAKEIMG1 payload — the explode shape a real
    frame-sampling stage has."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids, frame_idx, frames = [], [], []
        for mid, payload in zip(ids, payloads):
            try:
                w, h, n_frames, data = _decode_video(payload)
            except NotImplementedError:
                continue
            frame_size = w * h
            for i in range(0, n_frames, self.stride):
                raw = data[i * frame_size:(i + 1) * frame_size]
                out_ids.append(mid)
                frame_idx.append(i)
                frames.append(b"FAKEIMG1" + struct.pack("<HHB", w, h, 1) + raw)
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_index": pa.array(frame_idx, pa.int64()),
            "frame_payload": pa.array(frames, pa.binary()),
        })


def media_pool(ds, cls, *, batch_size: int = 32, num_cpus: float = 1, **ctor):
    """Wire a media stage: SMALL batches — payloads are KB-to-MB binary
    cells, so rows x mean-payload must stay well under the worker heap
    (for real image corpora use batch_size 8-16 at ~1 MB images)."""
    import ray
    n = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    concurrency = max(2, int(n * 0.75 / max(num_cpus, 1e-9)))
    return ds.map_batches(cls, fn_constructor_kwargs=ctor,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=num_cpus)
