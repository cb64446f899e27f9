"""Encoding-sniff golden corpus in the reference's html5lib-encoding .dat
style (reference: scripts/conformance/run-encoding-fixtures.mjs — the
html5lib-tests submodule is empty in this sandbox, so the cases are
authored from the WHATWG sniff semantics the reference implements:
sniff.ts BOM>transport>meta>default, comment stripping, quote-aware tag
scan, alias canonicalization, meta utf-16→utf-8).

The .dat text cases exercise the meta prescan + label table; BOM and
transport precedence need raw bytes / out-of-band labels, so they are
parametrized here directly.
"""

import os

import pytest

from html_parser_ray.htmlcore.sniff import sniff_html_encoding

_DAT = os.path.join(os.path.dirname(__file__), "fixtures",
                    "encoding_goldens", "cases.dat")


def _parse_dat(path):
    """Mirror of the reference's parseDatFixtures (#data / #encoding)."""
    cases = []
    section = ""
    data_lines: list[str] = []
    expected = ""

    def push():
        nonlocal data_lines, expected
        if expected.strip():
            cases.append((len(cases) + 1, "\n".join(data_lines),
                          expected.strip().lower()))
        data_lines, expected = [], ""

    with open(path, encoding="utf-8") as f:
        for line in f.read().split("\n"):
            if line == "#data":
                push()
                section = "data"
                continue
            if line == "#encoding":
                section = "encoding"
                continue
            if line.startswith("#"):
                continue
            if section == "data":
                data_lines.append(line)
            elif section == "encoding":
                expected += ("\n" if expected else "") + line
    push()
    return cases


_CASES = _parse_dat(_DAT)


def test_corpus_size():
    assert len(_CASES) >= 60


@pytest.mark.parametrize("case_id,data,expected",
                         _CASES, ids=[str(c[0]) for c in _CASES])
def test_encoding_golden(case_id, data, expected):
    result = sniff_html_encoding(data.encode("utf-8"))
    assert result.encoding == expected


# ---------------------------------------------------------------------------
# BOM + transport precedence (raw bytes / out-of-band label)

@pytest.mark.parametrize("data,label,expected,source", [
    (b"\xef\xbb\xbf<meta charset='koi8-r'>", None, "utf-8", "bom"),
    (b"\xfe\xff\x00<", None, "utf-16be", "bom"),
    (b"\xff\xfe<\x00", None, "utf-16le", "bom"),
    # BOM beats transport
    (b"\xef\xbb\xbfx", "koi8-r", "utf-8", "bom"),
    (b"\xff\xfex\x00", "utf-8", "utf-16le", "bom"),
    # transport beats meta
    (b"<meta charset='utf-8'>", "koi8-r", "koi8-r", "transport"),
    # transport aliases canonicalize; utf-16 transport label -> utf-8
    (b"x", "Latin1", "windows-1252", "transport"),
    (b"x", "UTF-16", "utf-8", "transport"),
    (b"x", "unicodefeff", "utf-8", "transport"),
    # invalid transport label falls through to meta, then default
    (b"<meta charset='ibm866'>", "no-such-enc", "ibm866", "meta"),
    (b"plain", "no-such-enc", "windows-1252", "default"),
    # quoted transport label (canonicalizeLabel strips quotes)
    (b"x", "'euc-jp'", "euc-jp", "transport"),
])
def test_bom_and_transport_precedence(data, label, expected, source):
    result = sniff_html_encoding(data, label)
    assert (result.encoding, result.source) == (expected, source)


def test_prescan_window_boundary():
    # meta beyond the 16 KiB prescan window is invisible
    pad = b"<!-- x -->" + b" " * 16_400
    late = pad + b"<meta charset='koi8-r'>"
    assert sniff_html_encoding(late).encoding == "windows-1252"
    # same meta inside the window is honored
    early = b"<meta charset='koi8-r'>" + b" " * 16_400
    assert sniff_html_encoding(early).encoding == "koi8-r"
