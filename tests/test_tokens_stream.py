"""Public tokenize API + byte-stream parse/tokenize equivalence tests
(mirror of the reference's stream-agent.test.js + tokenizer facade)."""

import pytest

from html_parser_ray.htmlcore.api import Budgets, BudgetExceededError, parse_bytes
from html_parser_ray.htmlcore.extract import visible_text
from html_parser_ray.htmlcore.stream import (
    decode_stream_to_text, parse_stream, tokenize_stream,
)
from html_parser_ray.htmlcore.tokens import tokenize


def _chunks(data: bytes, size: int):
    return [data[i:i + size] for i in range(0, len(data), size)]


# ---------------------------------------------------------------------------
# public tokenize

def test_tokenize_basic_shapes():
    toks = tokenize("<p class='x'>a&amp;b</p><!--c--><!DOCTYPE html>")
    assert toks[0] == {"type": "StartTag", "name": "p",
                      "attributes": {"class": "x"}, "selfClosing": False}
    assert toks[1] == {"type": "Character", "data": "a&b"}
    assert toks[2] == {"type": "EndTag", "name": "p"}
    assert toks[3] == {"type": "Comment", "data": "c"}
    assert toks[4]["type"] == "Doctype" and toks[4]["name"] == "html"
    assert toks[-1] == {"type": "EOF"}


def test_tokenize_merges_adjacent_characters():
    toks = tokenize("a&amp;b")
    chars = [t for t in toks if t["type"] == "Character"]
    assert chars == [{"type": "Character", "data": "a&b"}]


def test_tokenize_self_closing_and_doctype_ids():
    toks = tokenize('<br/><!DOCTYPE html PUBLIC "p" "s">')
    assert toks[0]["selfClosing"] is True
    dt = toks[1]
    assert dt["publicId"] == "p" and dt["systemId"] == "s"
    assert dt["forceQuirks"] is False


def test_tokenize_initial_state_overrides():
    # rawtext: markup is text until the matching end tag
    toks = tokenize("<b>x</b></title>y", initial_state="rcdata",
                    last_start_tag="title")
    assert toks[0] == {"type": "Character", "data": "<b>x</b>"}
    assert toks[1] == {"type": "EndTag", "name": "title"}
    toks = tokenize("<b>anything", initial_state="plaintext")
    assert toks[0] == {"type": "Character", "data": "<b>anything"}
    # adjacent Character tokens merge across the ]]> state switch (facade
    # merging, tokenize.ts:68-85)
    toks = tokenize("x < y]]>after", initial_state="cdata")
    assert toks[0] == {"type": "Character", "data": "x < yafter"}


def test_tokenize_unknown_state_rejected():
    with pytest.raises(ValueError):
        tokenize("x", initial_state="bogus")


def test_tokenize_budget():
    with pytest.raises(BudgetExceededError):
        tokenize("x" * 100, max_input_chars=10)


# ---------------------------------------------------------------------------
# stream ≡ bytes equivalence (stream-agent.test.js:90-113)

@pytest.mark.parametrize("chunk_size", [1, 3, 7, 4096])
def test_parse_stream_equals_parse_bytes(chunk_size):
    data = ("<!DOCTYPE html><html><head><meta charset='utf-8'></head>"
            "<body><p>é€中 &amp; more</p><table><tr><td>a</td></tr>"
            "</table></body></html>").encode("utf-8")
    whole = parse_bytes(data)
    streamed = parse_stream(_chunks(data, chunk_size))
    assert visible_text(streamed) == visible_text(whole)
    assert streamed.encoding.encoding == whole.encoding.encoding


def test_parse_stream_windows1252_default():
    data = b"<p>caf\xe9 \x97 dash</p>"
    streamed = parse_stream(_chunks(data, 2))
    assert visible_text(streamed) == visible_text(parse_bytes(data))
    assert streamed.encoding.encoding == "windows-1252"


def test_parse_stream_bom_split_across_chunks():
    data = b"\xef\xbb\xbf<p>bom</p>"
    streamed = parse_stream([data[:1], data[1:2], data[2:]])
    assert visible_text(streamed) == "bom"
    assert streamed.encoding.source == "bom"


def test_parse_stream_meta_beyond_first_chunk():
    # meta arrives within the 16 KiB prescan even when split across chunks
    data = (b"<html><head>" + b" " * 100 +
            b"<meta charset='utf-8'></head><body><p>caf\xc3\xa9</p></body>")
    streamed = parse_stream(_chunks(data, 64))
    assert "café" in visible_text(streamed)


def test_stream_max_input_bytes_aborts_early():
    pulls = []

    def gen():
        for i in range(100):
            pulls.append(i)
            yield b"x" * 10

    with pytest.raises(BudgetExceededError):
        decode_stream_to_text(gen(), budgets=Budgets(max_input_bytes=35))
    # aborted before draining the whole stream (stream-agent.test.js:115-132)
    assert len(pulls) <= 5


def test_stream_max_buffered_bytes():
    with pytest.raises(BudgetExceededError) as exc_info:
        decode_stream_to_text([b"x" * 2048] * 10,
                              budgets=Budgets(max_buffered_bytes=4096))
    assert exc_info.value.payload["budget"] == "maxBufferedBytes"


def test_tokenize_stream_equals_tokenize():
    data = "<p id='a'>text &copy; here</p>".encode("utf-8")
    from_stream = tokenize_stream(_chunks(data, 5))
    whole = tokenize(data.decode("utf-8"))
    assert from_stream == whole


# ---------------------------------------------------------------------------
# stream decode ≡ parse_bytes for EVERY sniffable WHATWG encoding (the
# canonical names aren't all Python codec names, and several map to
# different tables than the eponymous Python codec — regression for the
# incremental-decoder routing)

_ENCODING_CASES = [
    # (transport label, payload bytes)
    ("windows-874", "ไทย thai".encode("cp874")),            # no codec alias
    ("tis-620", "ไทย thai".encode("cp874")),
    ("x-user-defined", bytes(range(256))),
    ("iso-8859-8-i", "שלום abc".encode("iso8859-8")),
    ("x-mac-cyrillic", "привет".encode("mac-cyrillic")),
    ("windows-1252", bytes([0x81, 0x8D, 0x8F, 0x90, 0x9D]) + b" C1 <p>x</p>"),
    ("shift_jis", "漢字テスト".encode("cp932") + b"\x81"),   # cp932, not sjis
    ("big5", "中文字".encode("big5hkscs")),                  # big5hkscs table
    ("euc-kr", "한국어".encode("cp949")),                    # cp949 table
    ("gbk", "中文".encode("cp936")),
    ("koi8-u", "привіт".encode("koi8-u")),
    ("replacement", b"<anything at all>"),
    ("csiso2022kr", b"<anything at all>"),                   # replacement label
]


@pytest.mark.parametrize("label,data", _ENCODING_CASES,
                         ids=[c[0] for c in _ENCODING_CASES])
def test_parse_stream_equals_parse_bytes_all_encodings(label, data):
    data = b"<p>" + data + b"</p>"
    whole = parse_bytes(data, transport_encoding_label=label)
    for size in (1, 3, 7, 4096):
        streamed = parse_stream(_chunks(data, size),
                                transport_encoding_label=label)
        assert visible_text(streamed) == visible_text(whole), (label, size)
        assert streamed.encoding == whole.encoding
