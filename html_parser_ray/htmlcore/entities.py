"""HTML named character references (WHATWG entities table).

Data file ``entities.json`` is generated from the public WHATWG entities.json by
``tools/gen_entities.py``. Semantics mirror the reference tokenizer's charref
handling (reference: src/internal/vendor/entities/decode.js, decode-codepoint.js).
"""

from __future__ import annotations

import json
from pathlib import Path

_DATA_PATH = Path(__file__).with_name("entities.json")

#: name (no leading '&'; includes trailing ';' variants) -> replacement characters
ENTITIES: dict[str, str] = json.loads(_DATA_PATH.read_text())

#: names WITHOUT a trailing semicolon (legacy forms, e.g. "amp", "lt", "AElig")
LEGACY_ENTITIES: dict[str, str] = {k: v for k, v in ENTITIES.items() if not k.endswith(";")}

#: longest entity name length (with ';'), bounds the match scan
MAX_ENTITY_LEN: int = max(len(k) for k in ENTITIES)

# Numeric character reference overrides (WHATWG "Numeric character reference end
# state"): C0/C1 remap table. Public spec data; see also the reference's
# decode-codepoint.js.
NUMERIC_OVERRIDES: dict[int, int] = {
    0x00: 0xFFFD,
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def replace_numeric_codepoint(cp: int) -> str:
    """Map a numeric charref code point to its replacement character(s)."""
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return "�"
    cp = NUMERIC_OVERRIDES.get(cp, cp)
    return chr(cp)


# Build a prefix-match structure for attribute/data charref scanning: for each
# first-two-chars bucket keep candidate names sorted longest-first so the spec's
# longest-match rule is a linear scan over a tiny list.
_BUCKETS: dict[str, list[tuple[str, str]]] = {}
for _name, _chars in ENTITIES.items():
    _BUCKETS.setdefault(_name[:2], []).append((_name, _chars))
for _b in _BUCKETS.values():
    _b.sort(key=lambda kv: -len(kv[0]))


def match_entity(text: str, pos: int) -> tuple[str, str] | None:
    """Longest match of an entity name in ``text`` starting at ``pos``.

    ``text[pos]`` is the character right AFTER the '&'. Returns
    ``(matched_name, replacement)`` or None. The caller applies the
    in-attribute legacy restrictions per spec.
    """
    bucket = _BUCKETS.get(text[pos:pos + 2])
    if not bucket:
        # single-char legacy names do not exist (min length 2: "GT" etc.); but
        # two-char bucket needs both chars present — retry with 1-char prefix
        # only when at end of input.
        return None
    for name, chars in bucket:
        if text.startswith(name, pos):
            return name, chars
    return None
