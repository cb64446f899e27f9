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


def bounded_take_all(ds, *, what: str, limit: int = 20_000_000):
    """Materialize a SMALL Dataset (a histogram / per-group table) and
    collect it to the driver with a fail-loud cardinality guard.

    The operators that call this are exact by design and assume the
    collected table is bounded by value/group cardinality, not corpus
    size. When a pathological column breaks that assumption (e.g.
    exact quantiles over a near-unique column at 10^12 rows), a silent
    driver OOM is the worst failure mode — raise with the actual count
    and the remediation instead. ``count()`` after ``materialize()`` is
    metadata-only, so the guard costs no extra pass."""
    mat = ds.materialize()
    n = mat.count()
    if n > limit:
        raise ValueError(
            f"{what}: collected table has {n:,} rows, over the "
            f"driver-side limit of {limit:,} — the bounded-cardinality "
            "assumption this exact operator relies on does not hold for "
            "this input (coarsen the values, pre-bucket the column, or "
            "use a sketch-based variant)")
    return mat.take_all()
