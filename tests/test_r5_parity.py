"""Round-5 parity regressions, each minimized from tools/sweep_differential.py
sweeps and oracle-verified against the reference's vendored parser
(tools/ref_oracle/{error,span}_oracle.mjs) at fix time.

Classes covered: the dropped-construct character-token anchor (parse5
gives the text after a dropped ``</>`` the construct's start location),
hex-charref absence-of-digits offset, doctype-state error ordering vs
input-stream errors, per-NUL errors in tag/doctype names, and the
``</br>``-synthesized br element having no source span.
"""

from html_parser_ray.htmlcore.api import parse
from html_parser_ray.htmlcore.dom import Element, Text
from html_parser_ray.htmlcore.extract import walk


def _errors(html: str, **kw):
    return [[e.parse_error_id, e.span[0], e.span[1]]
            for e in parse(html, **kw).errors]


def _text_spans(html: str):
    t = parse(html, capture_spans=True)
    return [(n.value, n.start, n.end) for n, _ in walk(t)
            if isinstance(n, Text)]


# ---------------------------------------------------------------------------
# dropped-construct anchor (</> missing-end-tag-name)

def test_dropped_end_tag_anchors_following_text():
    # parse5: the text node absorbs the dropped construct's start
    assert _text_spans("</>tail") == [("tail", 0, 7)]
    assert _text_spans("<!-- c --></>tail") == [("tail", 10, 17)]
    # ...but a flushed whitespace token keeps its own boundary
    assert _text_spans("  </>tail") == [("tail", 5, 9)]


def test_dropped_end_tag_anchor_dies_at_next_real_token():
    # a following tag/comment discards the anchor
    assert _text_spans("</><p>tail") == [("tail", 6, 10)]
    t = parse("</><p>x", capture_spans=True)
    p = next(n for n, _ in walk(t)
             if isinstance(n, Element) and n.name == "p")
    # the p span starts at its own '<' (anchor discarded) and runs to EOF
    assert (p.start, p.end) == (3, 7)


def test_dropped_end_tag_anchor_compositions():
    assert _text_spans("</>&amp;x") == [("&x", 0, 9)]      # entity text
    assert _text_spans("a</>b") == [("ab", 0, 5)]          # pending run
    assert _text_spans("</></>x") == [("x", 0, 7)]         # two drops
    assert _text_spans("<p>a</>b</p>") == [("ab", 3, 8)]


def test_missing_doctype_location_follows_anchor():
    assert _errors("</>tail") == [
        ["missing-end-tag-name", 2, 2], ["missing-doctype", 0, 0]]
    assert _errors("<!-- c --></>tail") == [
        ["missing-end-tag-name", 12, 12], ["missing-doctype", 10, 10]]
    assert _errors("  </>tail") == [
        ["missing-end-tag-name", 4, 4], ["missing-doctype", 5, 5]]


# ---------------------------------------------------------------------------
# charref / doctype / tag-name error offsets and ordering

def test_hex_charref_absence_of_digits_offset():
    # the error fires at the first non-digit AFTER the consumed x
    errs = _errors("<p>&#xZZ;")
    assert ["absence-of-digits-in-numeric-character-reference", 6, 6] in errs
    errs = _errors("<p>&#Z;")
    assert ["absence-of-digits-in-numeric-character-reference", 5, 5] in errs


def test_doctype_errors_order_after_input_stream_errors():
    # the preprocessor's control-char error precedes the doctype-state
    # error for the same consumed char
    assert _errors("<!doctype\x7fx>") == [
        ["control-character-in-input-stream", 9, 9],
        ["missing-whitespace-before-doctype-name", 9, 9],
        ["non-conforming-doctype", 0, 12]]
    # NUL is not an input-stream error: chronological order holds
    assert _errors("<!doctype\x00x>") == [
        ["missing-whitespace-before-doctype-name", 9, 9],
        ["unexpected-null-character", 9, 9],
        ["non-conforming-doctype", 0, 12]]


def test_nul_in_doctype_name_and_tag_name_positions():
    errs = _errors("<!doctype h\x00t\x00ml>")
    assert ["unexpected-null-character", 11, 11] in errs
    assert ["unexpected-null-character", 13, 13] in errs
    errs = _errors("<p>\x00x")          # NUL in data keeps its site
    assert ["unexpected-null-character", 3, 3] in errs
    errs = _errors("<yx\x00y>")          # NUL inside a tag name, at the NUL
    assert ["unexpected-null-character", 3, 3] in errs


def test_error_stream_capture_spans_invariant():
    for html in ("</>tail", "<!doctype\x7fx>", "<p>&#xZZ;"):
        assert _errors(html) == _errors(html, capture_spans=True)


# ---------------------------------------------------------------------------
# synthesized br

def test_end_tag_br_synthesized_element_has_no_span():
    t = parse("x</br>y", capture_spans=True)
    br = next(n for n, _ in walk(t)
              if isinstance(n, Element) and n.name == "br")
    assert (br.start, br.end) == (-1, -1)
    # the surrounding text spans are unaffected
    assert _text_spans("x</br>y") == [("x", 0, 1), ("y", 6, 7)]


# ---------------------------------------------------------------------------
# CDATA token-end and image-rename classes (second r5 sweep batch)

def test_cdata_text_end_covers_following_dropped_construct():
    # parse5 keeps the character token open across the CDATA end marker;
    # its end location comes from the NEXT real token's flush, which
    # covers a dropped "</>" in between
    from html_parser_ray.htmlcore.api import parse_fragment
    t = parse_fragment("<font><![CDATA[hello]]></><header>", "math",
                       scripting_enabled=True, capture_spans=True)
    texts = [(n.value, n.start, n.end) for n, _ in walk(t)
             if isinstance(n, Text)]
    assert texts == [("hello", 6, 26)]
    # without a drop, the end still lands at the next token's start
    t = parse_fragment("<font><![CDATA[hello]]><header>", "math",
                       scripting_enabled=True, capture_spans=True)
    texts = [(n.value, n.start, n.end) for n, _ in walk(t)
             if isinstance(n, Text)]
    assert texts == [("hello", 6, 23)]
    # EOF right after the dropped construct extends to input end
    t = parse_fragment("<font><![CDATA[hello]]></>", "math",
                       scripting_enabled=True, capture_spans=True)
    texts = [(n.value, n.start, n.end) for n, _ in walk(t)
             if isinstance(n, Text)]
    assert texts == [("hello", 6, 26)]


def test_image_start_tag_rename_updates_current_token():
    # parse5 mutates the token's tagName image -> img; the trace
    # channel's currentToken must observe the rewrite
    tree = parse("<table><image>x", trace=True)
    trans = [e for e in tree.trace
             if e["kind"] == "insertionModeTransition"
             and e["toMode"] == "IN_TABLE_TEXT"]
    assert trans and trans[0]["tokenContext"]["tagName"] == "img"
    # the img element itself keeps the original token's span
    t = parse("<p><image>x", capture_spans=True)
    img = next(n for n, _ in walk(t)
               if isinstance(n, Element) and n.name == "img")
    assert (img.start, img.end) == (3, 10)
