"""From-scratch baseline JPEG codec (public ITU-T T.81 spec, no deps).

Same discipline as the PNG bridge decoder in ``stages/multimodal.py``
(reference analogue: the vendored-decoder pattern of
``/root/reference/src/internal/vendor/``): a real, spec-derived decode
path so the multimodal image stages exercise a second genuine codec
without PIL, plus a deterministic encoder used to synthesize real-format
test/bench payloads (JPEG is lossy, so roundtrip tests bound error rather
than demand identity; solid blocks reconstruct exactly).

Decoder scope (everything a baseline JFIF file uses):
  - SOF0/SOF1 (baseline / extended sequential, 8-bit), 1 or 3 components
  - arbitrary h/v sampling factors 1..4 (covers 4:4:4, 4:2:2, 4:2:0)
  - DQT (8- and 16-bit tables), DHT (multiple tables per segment)
  - DRI / RSTn restart intervals, 0xFF00 byte stuffing, fill bytes
  - batched float IDCT (numpy einsum), JFIF YCbCr -> RGB
Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes raise NotImplementedError -> quarantined per row upstream.

Encoder scope: baseline sequential, Annex-K quantization tables scaled by
the libjpeg quality formula, Annex-K Huffman tables, gray / 4:4:4 / 4:2:0,
optional restart intervals, minimal JFIF APP0.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K — public spec)

# zigzag order: ZIGZAG[k] = raster index of the k-th coefficient
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# (bits[1..16], values) per Annex K. bits[i] = number of codes of length i.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal DCT-II basis: C[u, x] = c(u) cos((2x+1) u pi / 16);
# F = C f C^T (forward), f = C^T F C (inverse) — T.81 A.3.3 with the
# 1/4 factor absorbed into the normalization
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16)
_C[0, :] *= np.sqrt(1 / 8)
_C[1:, :] *= np.sqrt(2 / 8)
del _u, _x

_ZZ_ROWS = ZIGZAG // 8
_ZZ_COLS = ZIGZAG % 8


# ---------------------------------------------------------------------------
# Huffman machinery

# most JPEGs (ours included) carry the Annex-K tables, so the 65k-entry
# prefix LUTs are memoized by table content: one build per actor, not
# one per image
_LUT_CACHE: dict[bytes, list] = {}


def _build_decode_lut(bits: list[int], vals: list[int]):
    """16-bit-prefix lookup: lut[peek16] = (length << 8) | value, 0 when
    no code matches (invalid stream). Canonical code assignment per
    T.81 C.2."""
    key = bytes(bits) + bytes(vals)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    if sum(bits) != len(vals):
        raise ValueError("JPEG: malformed Huffman table")
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            val = vals[k]
            k += 1
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            if hi > 65536:
                raise ValueError("JPEG: overfull Huffman table")
            entry = (length << 8) | val
            for i in range(lo, hi):
                lut[i] = entry
            code += 1
        code <<= 1
    if len(_LUT_CACHE) < 64:        # bounded per-process memo
        _LUT_CACHE[key] = lut
    return lut


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """val -> (code, length), canonical assignment (same walk as decode)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes; reads past the
    end return zero bits (the spec pads the final byte with 1s — by the
    time padding is consumed the MCU loop has already terminated)."""

    __slots__ = ("data", "n", "acc", "bits", "pad")

    def __init__(self, data: bytes):
        self.data = data
        self.n = 0
        self.acc = 0
        self.bits = 0
        self.pad = 0            # fabricated zero bytes fed to the window

    def _fill(self) -> None:
        data, n = self.data, self.n
        while self.bits <= 48:
            if n < len(data):
                self.acc = (self.acc << 8) | data[n]
                n += 1
            else:
                self.acc <<= 8
                self.pad += 1
            self.bits += 8
        self.n = n

    def overran(self) -> bool:
        """True when decode CONSUMED fabricated bits (prefetched-but-
        unconsumed zero bytes don't count) — a truncated stream."""
        return 8 * self.pad - self.bits > 0

    def read_huff(self, lut) -> int:
        if self.bits < 16:
            self._fill()
        entry = lut[(self.acc >> (self.bits - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("JPEG: invalid Huffman code")
        self.bits -= entry >> 8
        return entry & 0xFF

    def read_bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.bits < k:
            self._fill()
        self.bits -= k
        return (self.acc >> self.bits) & ((1 << k) - 1)


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            byte = (self.acc >> self.bits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
        self.acc &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.put((1 << pad) - 1, pad)   # pad final byte with 1s


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit category of a signed coefficient (T.81 F.1.2.1.2)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG -> (width, height, 3, HxWx3 uint8). Gray expands to
    RGB so the feature stages see one layout (same contract as
    decode_png). Raises ValueError on corrupt streams and
    NotImplementedError on non-baseline modes — both quarantined per row
    by the calling stage."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_luts: dict[int, list] = {}
    ac_luts: dict[int, list] = {}
    frame = None            # (w, h, [(cid, h, v, tq)])
    restart_interval = 0
    pos = 2
    n = len(payload)
    scan = None
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        while pos < n and payload[pos] == 0xFF:
            pos += 1            # fill bytes
        if pos >= n:
            raise ValueError("JPEG: truncated at marker")
        marker = payload[pos]
        pos += 1
        if marker == 0xD9:      # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            continue            # stray RST outside a scan
        if pos + 2 > n:
            raise ValueError("JPEG: truncated segment header")
        seglen = (payload[pos] << 8) | payload[pos + 1]
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker in (0xC0, 0xC1):          # SOF0 / SOF1
            if len(body) < 6:
                raise ValueError("JPEG: truncated SOF")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("JPEG: truncated SOF")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if not (1 <= (hv >> 4) <= 4 and 1 <= (hv & 15) <= 4):
                    raise ValueError("JPEG: invalid sampling factors")
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
        elif marker == 0xC2:
            raise NotImplementedError("JPEG: progressive not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDB:                # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                try:
                    if pq:
                        vals = np.frombuffer(body, ">u2", 64,
                                             i).astype(np.int64)
                        i += 128
                    else:
                        vals = np.frombuffer(body, np.uint8, 64,
                                             i).astype(np.int64)
                        i += 64
                except ValueError:
                    raise ValueError("JPEG: truncated DQT") from None
                qt[tq] = vals               # zigzag order
        elif marker == 0xC4:                # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("JPEG: truncated DHT")
                nvals = sum(bits)
                vals = list(body[i + 17:i + 17 + nvals])
                if len(vals) != nvals:
                    raise ValueError("JPEG: truncated DHT")
                i += 17 + nvals
                lut = _build_decode_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
        elif marker == 0xDD:                # DRI
            if len(body) < 2:
                raise ValueError("JPEG: truncated DRI")
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDA:                # SOS
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("JPEG: truncated SOS")
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tdta >> 4, tdta & 15))
            # entropy data runs to the next non-RST/non-stuffed marker
            start = pos
            while True:
                idx = payload.find(b"\xff", pos)
                if idx < 0 or idx + 1 >= n:
                    pos = n
                    break
                nxt = payload[idx + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    pos = idx + 2
                    continue
                pos = idx
                break
            scan = (sel, payload[start:pos])
            break                           # single-scan baseline
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF/SOS")
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("JPEG: degenerate dimensions")
    if w * h > 64_000_000:
        # coefficient stores allocate ~8 B/pixel/component up front; a
        # crafted SOF must not OOM the worker before the (post-alloc)
        # truncated-scan check fires
        raise ValueError("JPEG: dimensions exceed bridge-decoder cap")
    if len(comps) not in (1, 3):
        raise NotImplementedError("JPEG: only 1 or 3 components")
    sel, entropy = scan
    if len(sel) != len(comps):
        raise NotImplementedError("JPEG: multi-scan baseline not supported")
    table_for = {cs: (td, ta) for cs, td, ta in sel}
    for cid, _ch, _cv, _tq in comps:
        if cid not in table_for:
            raise ValueError("JPEG: scan omits a frame component")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # split the scan on restart markers; each interval restarts DC pred
    if restart_interval:
        intervals = []
        p = 0
        while p < len(entropy):
            idx = entropy.find(b"\xff", p)
            seg_start = p
            while True:
                if idx < 0:
                    intervals.append(entropy[seg_start:])
                    p = len(entropy)
                    break
                nxt = entropy[idx + 1] if idx + 1 < len(entropy) else None
                if nxt == 0x00:
                    idx = entropy.find(b"\xff", idx + 2)
                    continue
                if nxt is not None and 0xD0 <= nxt <= 0xD7:
                    intervals.append(entropy[seg_start:idx])
                    p = idx + 2
                    break
                intervals.append(entropy[seg_start:])
                p = len(entropy)
                break
    else:
        intervals = [entropy]
    intervals = [iv.replace(b"\xff\x00", b"\xff") for iv in intervals]

    # per-component zigzag coefficient store
    plane_blocks = []
    for _cid, ch, cv, _tq in comps:
        plane_blocks.append(np.zeros(
            (mcus_y * cv, mcus_x * ch, 64), dtype=np.int64))

    per_interval = restart_interval or n_mcus
    mcu = 0
    for interval in intervals:
        if mcu >= n_mcus:
            break
        reader = _BitReader(interval)
        preds = [0] * len(comps)
        stop = min(n_mcus, mcu + per_interval)
        while mcu < stop:
            my, mx = divmod(mcu, mcus_x)
            for ci, (cid, ch, cv, _tq) in enumerate(comps):
                td, ta = table_for[cid]
                try:
                    dc_lut, ac_lut = dc_luts[td], ac_luts[ta]
                except KeyError:
                    raise ValueError("JPEG: scan references missing "
                                     "Huffman table") from None
                blocks = plane_blocks[ci]
                for by in range(cv):
                    for bx in range(ch):
                        coef = blocks[my * cv + by, mx * ch + bx]
                        t = reader.read_huff(dc_lut)
                        if t:
                            preds[ci] += _extend(reader.read_bits(t), t)
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_huff(ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break       # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC run overflow")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
            mcu += 1
        if reader.overran():
            raise ValueError("JPEG: truncated scan data")
    if mcu < n_mcus:
        raise ValueError("JPEG: truncated scan data")

    # dequantize + batched IDCT + assemble planes
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("JPEG: missing quantization table")
        zz = plane_blocks[ci].reshape(-1, 64) * qt[tq][None, :]
        blocks = np.zeros((zz.shape[0], 8, 8))
        blocks[:, _ZZ_ROWS, _ZZ_COLS] = zz
        pix = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        bh, bw = mcus_y * cv, mcus_x * ch
        plane = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
                   .reshape(bh * 8, bw * 8)
        if ch != hmax or cv != vmax:        # replicate upsample
            plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                              hmax // ch, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        gray = planes[0]
        return w, h, 3, np.ascontiguousarray(
            np.repeat(gray[:, :, None], 3, axis=2))
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb], axis=2)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder

def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling over the Annex-K base tables (zigzag
    order out)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = np.clip((base * scale + 50) // 100, 1, 255)
        out.append(t[ZIGZAG])               # raster -> zigzag
    return out[0], out[1]


def _encode_blocks(plane: np.ndarray, qtbl_zz: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) -> (n_blocks_y,
    n_blocks_x, 64) quantized zigzag coefficients."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,abxy,vy->abuv", _C, blocks, _C)
    zz = coef[:, :, _ZZ_ROWS, _ZZ_COLS]
    q = np.round(zz / qtbl_zz.reshape(64)[None, None, :]).astype(np.int64)
    return q


def _pad_to(plane: np.ndarray, height: int, width: int) -> np.ndarray:
    """Edge-replicate pad to the MCU grid (T.81 recommends replication
    so padded blocks cost few bits)."""
    out = np.empty((height, width), dtype=plane.dtype)
    h, w = plane.shape
    out[:h, :w] = plane
    if w < width:
        out[:h, w:] = plane[:, -1:]
    if h < height:
        out[h:, :] = out[h - 1:h, :]
    return out


def _write_block(writer: _BitWriter, coef, pred: int,
                 dc_tab: dict, ac_tab: dict) -> int:
    diff = int(coef[0]) - pred
    t = _category(diff)
    code, length = dc_tab[t]
    writer.put(code, length)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        writer.put(v & ((1 << t) - 1), t)
    run = 0
    last_nz = 0
    nz = np.nonzero(coef[1:])[0]
    last_nz = (nz[-1] + 1) if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]     # ZRL
            writer.put(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_tab[(run << 4) | s]
        writer.put(code, length)
        mag = v if v >= 0 else v + (1 << s) - 1
        writer.put(mag & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]         # EOB
        writer.put(code, length)
    return int(coef[0])


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 90,
                         subsampling: str = "4:4:4",
                         restart_interval: int = 0) -> bytes:
    """Encode (H, W, 3) or (H, W) uint8 -> baseline JFIF bytes.

    Deterministic (same input -> same bytes); used to synthesize
    real-format media payloads and as the test-side half of the
    roundtrip property suite."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (H, W) gray or (H, W, 3) RGB")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    q_luma, q_chroma = _quality_tables(quality)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qids = [0]
    else:
        f = arr.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
            # 2x2 box average over an edge-replicated even-sized plane
            eh, ew = h + (h & 1), w + (w & 1)
            cb2 = _pad_to(cb, eh, ew)
            cr2 = _pad_to(cr, eh, ew)
            cb = cb2.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = cr2.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    qtbls = [q_luma, q_chroma]
    coef_planes = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        coef_planes.append(_encode_blocks(
            _pad_to(plane, mcus_y * sv * 8, mcus_x * sh * 8), qtbls[qid]))

    dc_tabs = [_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
               _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_tabs = [_build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
               _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    out = bytearray(b"\xff\xd8")                     # SOI
    out += (b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"  # APP0, 1:1 aspect
            b"\x00\x01\x00\x01\x00\x00")
    for tq, tbl in enumerate(qtbls[:1 if gray else 2]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in tbl)
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, ((sh, sv), qid) in enumerate(zip(samp, qids)):
        out += bytes([i + 1, (sh << 4) | sv, qid])
    for tc, specs in ((0, ((_DC_LUMA_BITS, _DC_LUMA_VALS),
                           (_DC_CHROMA_BITS, _DC_CHROMA_VALS))),
                      (1, ((_AC_LUMA_BITS, _AC_LUMA_VALS),
                           (_AC_CHROMA_BITS, _AC_CHROMA_VALS)))):
        for th, (bits, vals) in enumerate(specs[:1 if gray else 2]):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i, qid in enumerate(qids):
        out += bytes([i + 1, (qid << 4) | qid])
    out += b"\x00\x3f\x00"                           # Ss=0 Se=63 Ah/Al=0

    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcus_x)
        for ci, ((sh, sv), qid) in enumerate(zip(samp, qids)):
            for by in range(sv):
                for bx in range(sh):
                    coef = coef_planes[ci][my * sv + by, mx * sh + bx]
                    preds[ci] = _write_block(
                        writer, coef, preds[ci],
                        dc_tabs[qid], ac_tabs[qid])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"                               # EOI
    return bytes(out)
