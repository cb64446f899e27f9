"""Shared oracle-critical primitives — ONE definition each.

Both of these are load-bearing cross-engine conventions: every SQL
oracle that tokenizes text uses the explicit ASCII whitespace class
(DuckDB's RE2 \\s and trim() are ASCII-only, Python's \\s is Unicode —
the class is the only split both engines agree on), and every
hash-keyed operator (sampling, sharding, splits, sketches, simhash)
equates ``_md5_low64_str`` with DuckDB ``md5_number_lower`` (lower 8
md5 digest bytes, little-endian). Private copies of either invite
silent divergence; import from here."""

from __future__ import annotations

import hashlib
import re
import struct

_WS = re.compile(r"[ \t\n\r\f]+")
_unpack_q = struct.Struct("<Q").unpack


def _tokens_of(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower()) if t]


def _md5_low64_str(s: str) -> int:
    return _unpack_q(hashlib.md5(s.encode()).digest()[8:])[0]
