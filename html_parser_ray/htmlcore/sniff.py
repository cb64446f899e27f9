"""HTML encoding sniffing + bytes→text decoding.

Behavioral parity target: the reference's encoding sniffer
(reference: src/internal/encoding/sniff.ts:271-301) — BOM > transport label >
<meta charset> prescan (first 16 KiB, latin1-decoded, comments stripped) >
default windows-1252, with alias canonicalization (latin1 family →
windows-1252; meta/transport utf-16 labels → utf-8).

Label canonicalization follows the public WHATWG Encoding Standard label table
(the reference delegates to TextDecoder for this).
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass

PRESCAN_BYTES_DEFAULT = 16_384

# WHATWG Encoding Standard: label -> canonical encoding name (public table).
_LABEL_GROUPS: dict[str, tuple[str, ...]] = {
    "utf-8": ("unicode-1-1-utf-8", "unicode11utf8", "unicode20utf8", "utf-8", "utf8", "x-unicode20utf8"),
    "ibm866": ("866", "cp866", "csibm866", "ibm866"),
    "iso-8859-2": ("csisolatin2", "iso-8859-2", "iso-ir-101", "iso8859-2", "iso88592", "iso_8859-2", "iso_8859-2:1987", "l2", "latin2"),
    "iso-8859-3": ("csisolatin3", "iso-8859-3", "iso-ir-109", "iso8859-3", "iso88593", "iso_8859-3", "iso_8859-3:1988", "l3", "latin3"),
    "iso-8859-4": ("csisolatin4", "iso-8859-4", "iso-ir-110", "iso8859-4", "iso88594", "iso_8859-4", "iso_8859-4:1988", "l4", "latin4"),
    "iso-8859-5": ("csisolatincyrillic", "cyrillic", "iso-8859-5", "iso-ir-144", "iso8859-5", "iso88595", "iso_8859-5", "iso_8859-5:1988"),
    "iso-8859-6": ("arabic", "asmo-708", "csiso88596e", "csiso88596i", "csisolatinarabic", "ecma-114", "iso-8859-6", "iso-8859-6-e", "iso-8859-6-i", "iso-ir-127", "iso8859-6", "iso88596", "iso_8859-6", "iso_8859-6:1987"),
    "iso-8859-7": ("csisolatingreek", "ecma-118", "elot_928", "greek", "greek8", "iso-8859-7", "iso-ir-126", "iso8859-7", "iso88597", "iso_8859-7", "iso_8859-7:1987", "sun_eu_greek"),
    "iso-8859-8": ("csiso88598e", "csisolatinhebrew", "hebrew", "iso-8859-8", "iso-8859-8-e", "iso-ir-138", "iso8859-8", "iso88598", "iso_8859-8", "iso_8859-8:1988", "visual"),
    "iso-8859-8-i": ("csiso88598i", "iso-8859-8-i", "logical"),
    "iso-8859-10": ("csisolatin6", "iso-8859-10", "iso-ir-157", "iso8859-10", "iso885910", "l6", "latin6"),
    "iso-8859-13": ("iso-8859-13", "iso8859-13", "iso885913"),
    "iso-8859-14": ("iso-8859-14", "iso8859-14", "iso885914"),
    "iso-8859-15": ("csisolatin9", "iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15", "l9"),
    "iso-8859-16": ("iso-8859-16",),
    "koi8-r": ("cskoi8r", "koi", "koi8", "koi8-r", "koi8_r"),
    "koi8-u": ("koi8-ru", "koi8-u"),
    "macintosh": ("csmacintosh", "mac", "macintosh", "x-mac-roman"),
    "windows-874": ("dos-874", "iso-8859-11", "iso8859-11", "iso885911", "tis-620", "windows-874"),
    "windows-1250": ("cp1250", "windows-1250", "x-cp1250"),
    "windows-1251": ("cp1251", "windows-1251", "x-cp1251"),
    "windows-1252": ("ansi_x3.4-1968", "ascii", "cp1252", "cp819", "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100", "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1", "latin1", "us-ascii", "windows-1252", "x-cp1252"),
    "windows-1253": ("cp1253", "windows-1253", "x-cp1253"),
    "windows-1254": ("cp1254", "csisolatin5", "iso-8859-9", "iso-ir-148", "iso8859-9", "iso88599", "iso_8859-9", "iso_8859-9:1989", "l5", "latin5", "windows-1254", "x-cp1254"),
    "windows-1255": ("cp1255", "windows-1255", "x-cp1255"),
    "windows-1256": ("cp1256", "windows-1256", "x-cp1256"),
    "windows-1257": ("cp1257", "windows-1257", "x-cp1257"),
    "windows-1258": ("cp1258", "windows-1258", "x-cp1258"),
    "x-mac-cyrillic": ("x-mac-cyrillic", "x-mac-ukrainian"),
    "gbk": ("chinese", "csgb2312", "csiso58gb231280", "gb2312", "gb_2312", "gb_2312-80", "gbk", "iso-ir-58", "x-gbk"),
    "gb18030": ("gb18030",),
    "big5": ("big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5"),
    "euc-jp": ("cseucpkdfmtjapanese", "euc-jp", "x-euc-jp"),
    "iso-2022-jp": ("csiso2022jp", "iso-2022-jp"),
    "shift_jis": ("csshiftjis", "ms932", "ms_kanji", "shift-jis", "shift_jis", "sjis", "windows-31j", "x-sjis"),
    "euc-kr": ("cseuckr", "csksc56011987", "euc-kr", "iso-ir-149", "korean", "ks_c_5601-1987", "ks_c_5601-1989", "ksc5601", "ksc_5601", "windows-949"),
    "replacement": ("csiso2022kr", "hz-gb-2312", "iso-2022-cn", "iso-2022-cn-ext", "iso-2022-kr", "replacement"),
    "utf-16be": ("unicodefffe", "utf-16be"),
    "utf-16le": ("csunicode", "iso-10646-ucs-2", "ucs-2", "unicode", "unicodefeff", "utf-16", "utf-16le"),
    "x-user-defined": ("x-user-defined",),
}

LABEL_TO_ENCODING: dict[str, str] = {
    label: canonical for canonical, labels in _LABEL_GROUPS.items() for label in labels
}

# canonical WHATWG name -> python codec name (or special-cased in decode()).
_PY_CODECS: dict[str, str] = {
    "utf-8": "utf-8",
    "ibm866": "cp866",
    "iso-8859-2": "iso8859-2", "iso-8859-3": "iso8859-3", "iso-8859-4": "iso8859-4",
    "iso-8859-5": "iso8859-5", "iso-8859-6": "iso8859-6", "iso-8859-7": "iso8859-7",
    "iso-8859-8": "iso8859-8", "iso-8859-8-i": "iso8859-8", "iso-8859-10": "iso8859-10",
    "iso-8859-13": "iso8859-13", "iso-8859-14": "iso8859-14", "iso-8859-15": "iso8859-15",
    "iso-8859-16": "iso8859-16",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "macintosh": "mac-roman",
    "windows-874": "cp874",
    "windows-1250": "cp1250", "windows-1251": "cp1251", "windows-1252": "cp1252",
    "windows-1253": "cp1253", "windows-1254": "cp1254", "windows-1255": "cp1255",
    "windows-1256": "cp1256", "windows-1257": "cp1257", "windows-1258": "cp1258",
    "x-mac-cyrillic": "mac-cyrillic",
    "gbk": "cp936", "gb18030": "gb18030", "big5": "big5hkscs",
    "euc-jp": "euc_jp", "iso-2022-jp": "iso2022_jp", "shift_jis": "cp932",
    "euc-kr": "cp949",
    "utf-16be": "utf-16-be", "utf-16le": "utf-16-le",
}

_WINDOWS_1252_ALIASES = frozenset({"iso-8859-1", "iso8859-1", "latin1", "latin-1", "us-ascii"})


@dataclass(frozen=True)
class SniffResult:
    encoding: str
    source: str  # "bom" | "transport" | "meta" | "default"


# canonical encodings whose labels the reference's TextDecoder-backed
# canonicalization rejects (see canonicalize_label below)
_TEXTDECODER_UNSUPPORTED = frozenset(
    ["iso-8859-16", "replacement", "x-user-defined"])


def _strip_quotes(value: str) -> str:
    trimmed = value.strip()
    if len(trimmed) >= 2 and trimmed[0] == trimmed[-1] and trimmed[0] in "\"'":
        return trimmed[1:-1].strip()
    return trimmed


def canonicalize_label(label: str, source: str) -> str | None:
    """Mirror of the reference's canonicalizeLabel (sniff.ts:48-77)."""
    normalized = _strip_quotes(label).lower().strip()
    if not normalized:
        return None
    if normalized in _WINDOWS_1252_ALIASES:
        return "windows-1252"
    if source in ("meta", "transport") and normalized.startswith("utf-16"):
        return "utf-8"
    encoding = LABEL_TO_ENCODING.get(normalized)
    if encoding is None:
        return None
    if encoding in _TEXTDECODER_UNSUPPORTED:
        # The reference canonicalizes via `new TextDecoder(label)`
        # (sniff.ts:62-75), and Node's TextDecoder — in the reference's
        # own CI as here — throws RangeError for exactly these three
        # WHATWG encodings (replacement by spec; x-user-defined and
        # iso-8859-16 as engine gaps). The reference therefore treats
        # their labels as unknown and falls through to the next signal /
        # the default. Differential-verified vs the reference's sniff
        # (tools/ref_oracle/encoding_oracle.mjs); the WHATWG-table
        # alternative would return them and break byte parity.
        return None
    if encoding == "iso-8859-1":  # unreachable (alias set above) — kept for parity
        return "windows-1252"
    if source in ("meta", "transport") and encoding.startswith("utf-16"):
        return "utf-8"
    return encoding


def _detect_bom(data: bytes) -> str | None:
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:2] == b"\xfe\xff":
        return "utf-16be"
    if data[:2] == b"\xff\xfe":
        return "utf-16le"
    return None


_META_TAG_START = re.compile(r"^<meta(?=[\t\n\f\r />])", re.IGNORECASE)
_CHARSET_IN_CONTENT = re.compile(r"charset\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s;\"'>]+)", re.IGNORECASE)
_ATTR_SPACE = "\t\n\f\r "


def _strip_html_comments(text: str) -> str:
    out: list[str] = []
    cursor = 0
    while cursor < len(text):
        start = text.find("<!--", cursor)
        if start == -1:
            out.append(text[cursor:])
            break
        out.append(text[cursor:start])
        end = text.find("-->", start + 4)
        if end == -1:
            break
        cursor = end + 3
    return "".join(out)


# one tag: "<", then body chars with quoted sections opaque, then the
# first ">" outside quotes — the regex equivalent of the spec's
# quote-tracking scan (an unterminated quote never reaches ">", so the
# match fails exactly where the manual scan would run off the prescan)
_TAG_SPAN = re.compile(r"""<[^>"']*(?:"[^"]*"[^>"']*|'[^']*'[^>"']*)*>""")


def _extract_meta_tags(scan: str):
    """Yield meta tags lazily — the caller stops at the first tag that
    produces a valid charset, so the common <meta charset> in the first
    few tags never pays for walking the rest of the 16 KB prescan."""
    index = 0
    find = scan.find
    while True:
        tag_start = find("<", index)
        if tag_start == -1:
            break
        m = _TAG_SPAN.match(scan, tag_start)
        if m is None:       # no ">" outside quotes before end-of-prescan
            break
        tag_text = m.group()
        if _META_TAG_START.match(tag_text):
            yield tag_text
        index = m.end()


def _parse_meta_attributes(tag: str) -> dict[str, str]:
    body = re.sub(r"^<meta", "", tag, flags=re.IGNORECASE)
    body = re.sub(r">$", "", body)
    attrs: dict[str, str] = {}
    index = 0
    n = len(body)
    while index < n:
        while index < n and (body[index] in _ATTR_SPACE or body[index] == "/"):
            index += 1
        if index >= n:
            break
        name_start = index
        while index < n and body[index] not in "\t\n\f\r />=":
            index += 1
        raw_name = body[name_start:index].lower()
        if not raw_name:
            break
        while index < n and body[index] in _ATTR_SPACE:
            index += 1
        value = ""
        if index < n and body[index] == "=":
            index += 1
            while index < n and body[index] in _ATTR_SPACE:
                index += 1
            if index < n and body[index] in "\"'":
                quote = body[index]
                index += 1
                value_start = index
                while index < n and body[index] != quote:
                    index += 1
                if index >= n:
                    return {}
                value = body[value_start:index]
                index += 1
            else:
                value_start = index
                while index < n and body[index] not in "\t\n\f\r >":
                    index += 1
                value = body[value_start:index]
        attrs[raw_name] = value
    return attrs


def _sniff_meta_charset(data: bytes, max_prescan: int) -> str | None:
    scan = _strip_html_comments(data[:max_prescan].decode("latin-1"))
    for tag in _extract_meta_tags(scan):
        attrs = _parse_meta_attributes(tag)
        direct = attrs.get("charset")
        if direct:
            canonical = canonicalize_label(direct, "meta")
            if canonical:
                return canonical
        if attrs.get("http-equiv", "").lower() == "content-type":
            content = attrs.get("content")
            if content:
                match = _CHARSET_IN_CONTENT.search(content)
                if match:
                    canonical = canonicalize_label(_strip_quotes(match.group(1)), "meta")
                    if canonical:
                        return canonical
    return None


def sniff_html_encoding(
    data: bytes,
    transport_encoding_label: str | None = None,
    max_prescan_bytes: int = PRESCAN_BYTES_DEFAULT,
    default_encoding: str = "windows-1252",
) -> SniffResult:
    default = canonicalize_label(default_encoding, "default") or "windows-1252"
    bom = _detect_bom(data)
    if bom:
        return SniffResult(bom, "bom")
    if transport_encoding_label:
        transport = canonicalize_label(transport_encoding_label, "transport")
        if transport:
            return SniffResult(transport, "transport")
    meta = _sniff_meta_charset(data, max_prescan_bytes)
    if meta:
        return SniffResult(meta, "meta")
    return SniffResult(default, "default")


# WHATWG windows-1252 maps ALL 256 bytes (0x80-0x9F per the table; the five
# bytes Python's cp1252 rejects map to the matching C1 controls).
_CP1252_FIXUP = {0x81: "\x81", 0x8D: "\x8d", 0x8F: "\x8f", 0x90: "\x90", 0x9D: "\x9d"}
_CP1252_TABLE = "".join(
    _CP1252_FIXUP.get(b, None) or bytes([b]).decode("cp1252", errors="replace")
    for b in range(256)
)

_CP1252_TRANSLATE = str.maketrans({i: _CP1252_TABLE[i] for i in range(0x80, 0xA0)})

_XUD_TABLE = "".join(chr(b) if b < 0x80 else chr(0xF780 + b - 0x80) for b in range(256))
_XUD_TRANSLATE = str.maketrans({i: _XUD_TABLE[i] for i in range(0x80, 0x100)})


def decode_bytes(data: bytes, encoding: str) -> str:
    """Decode like WHATWG TextDecoder(encoding): BOM-stripping, U+FFFD errors."""
    if encoding == "utf-8":
        if data[:3] == b"\xef\xbb\xbf":
            data = data[3:]
        return data.decode("utf-8", errors="replace")
    if encoding == "utf-16le":
        if data[:2] == b"\xff\xfe":
            data = data[2:]
        return data.decode("utf-16-le", errors="replace")
    if encoding == "utf-16be":
        if data[:2] == b"\xfe\xff":
            data = data[2:]
        return data.decode("utf-16-be", errors="replace")
    if encoding == "windows-1252":
        return data.decode("latin-1").translate(_CP1252_TRANSLATE)
    if encoding == "x-user-defined":
        return data.decode("latin-1").translate(_XUD_TRANSLATE)
    if encoding == "replacement":
        return "�" if data else ""
    codec = _PY_CODECS.get(encoding)
    if codec is None:
        return data.decode("latin-1").translate(_CP1252_TRANSLATE)
    return data.decode(codec, errors="replace")


def decode_html_bytes(
    data: bytes,
    transport_encoding_label: str | None = None,
    max_prescan_bytes: int = PRESCAN_BYTES_DEFAULT,
) -> tuple[str, SniffResult]:
    """Sniff + decode (reference: decodeHtmlBytes, sniff.ts:294-301)."""
    sniff = sniff_html_encoding(data, transport_encoding_label, max_prescan_bytes)
    return decode_bytes(data, sniff.encoding), sniff
