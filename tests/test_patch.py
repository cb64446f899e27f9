"""Span capture + patch planning tests (mirror of the reference's
test/control/spans-patch.test.js)."""

import pytest

from html_parser_ray.htmlcore.api import parse
from html_parser_ray.htmlcore.dom import Element, Text
from html_parser_ray.htmlcore.extract import serialize_node, walk
from html_parser_ray.htmlcore.patch import (
    PatchPlanningError, apply_patch_plan, compute_patch,
)


def _find(tree, pred):
    for node, _depth in walk(tree):
        if pred(node):
            return node
    return None


def _nid(tree, node) -> int:
    return tree.ids[id(node)]


def test_capture_spans_elements_and_attrs():
    html = '<!doctype html><html><body><p class="x">Hi</p></body></html>'
    tree = parse(html, capture_spans=True)
    p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p")
    assert p is not None and p.start >= 0
    assert html[p.start:p.end] == '<p class="x">Hi</p>'
    idx = [a[0] for a in p.attrs].index("class")
    aspan = p.attr_spans[idx]
    assert html[aspan[0]:aspan[1]] == 'class="x"'


def test_implied_wrappers_have_no_input_span():
    tree = parse("<p>x</p>", capture_spans=True)
    body = _find(tree, lambda n: isinstance(n, Element) and n.name == "body")
    assert body is not None and body.start < 0


def test_compute_patch_structural_edits():
    original = '<div><p class="x">one</p><p>two</p></div>'
    tree = parse(original, capture_spans=True)
    first_p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p"
                    and serialize_node(n) == '<p class="x">one</p>')
    first_text = _find(tree, lambda n: isinstance(n, Text) and n.value == "one")
    edits = [
        {"kind": "replaceText", "target": _nid(tree, first_text), "value": "uno"},
        {"kind": "setAttr", "target": _nid(tree, first_p),
         "name": "class", "value": "y"},
        {"kind": "insertHtmlAfter", "target": _nid(tree, first_p),
         "html": "<hr>"},
    ]
    plan1 = compute_patch(original, edits)
    plan2 = compute_patch(original, edits)
    assert plan1 == plan2
    patched = apply_patch_plan(original, plan1)
    assert patched == '<div><p class="y">uno</p><hr><p>two</p></div>'
    assert plan1["result"] == patched


def test_compute_patch_set_new_attr():
    original = "<div><p>one</p></div>"
    tree = parse(original, capture_spans=True)
    p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p")
    plan = compute_patch(original, [
        {"kind": "setAttr", "target": _nid(tree, p), "name": "id",
         "value": "a&b"}])
    assert plan["result"] == '<div><p id="a&amp;b">one</p></div>'


def test_compute_patch_remove_attr():
    original = '<div><p class="x" data-k="v">one</p></div>'
    tree = parse(original, capture_spans=True)
    p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p")
    plan = compute_patch(original, [
        {"kind": "removeAttr", "target": _nid(tree, p), "name": "class"}])
    assert apply_patch_plan(original, plan) == '<div><p data-k="v">one</p></div>'


def test_compute_patch_insert_before_with_remove():
    original = "<ul><li>a</li><li>b</li></ul>"
    tree = parse(original, capture_spans=True)
    second = _find(tree, lambda n: isinstance(n, Element) and n.name == "li"
                   and serialize_node(n) == "<li>b</li>")
    plan = compute_patch(original, [
        {"kind": "insertHtmlBefore", "target": _nid(tree, second),
         "html": "<li>x</li>"},
        {"kind": "removeNode", "target": _nid(tree, second)},
    ])
    assert apply_patch_plan(original, plan) == "<ul><li>a</li><li>x</li></ul>"


def test_compute_patch_rejects_inferred_span_targets():
    original = "<p>x</p>"
    tree = parse(original, capture_spans=True)
    body = _find(tree, lambda n: isinstance(n, Element) and n.name == "body")
    with pytest.raises(PatchPlanningError) as exc_info:
        compute_patch(original, [
            {"kind": "removeNode", "target": _nid(tree, body)}])
    assert exc_info.value.payload["code"] == "NON_INPUT_SPAN_PROVENANCE"
    assert exc_info.value.payload["detail"] == "inferred"


def test_compute_patch_rejects_overlaps():
    original = "<div><p>one</p></div>"
    tree = parse(original, capture_spans=True)
    p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p")
    div = _find(tree, lambda n: isinstance(n, Element) and n.name == "div")
    with pytest.raises(PatchPlanningError) as exc_info:
        compute_patch(original, [
            {"kind": "removeNode", "target": _nid(tree, div)},
            {"kind": "removeNode", "target": _nid(tree, p)},
        ])
    assert exc_info.value.payload["code"] == "OVERLAPPING_EDITS"


def test_compute_patch_unknown_target():
    with pytest.raises(PatchPlanningError) as exc_info:
        compute_patch("<p>x</p>", [{"kind": "removeNode", "target": 99999}])
    assert exc_info.value.payload["code"] == "NODE_NOT_FOUND"


def test_compute_patch_empty_edits_identity():
    plan = compute_patch("<p>x</p>", [])
    assert plan["result"] == "<p>x</p>"
    assert apply_patch_plan("<p>x</p>", plan) == "<p>x</p>"


def test_compute_patch_crlf_input_spans_map_back():
    original = '<div>\r\n<p class="x">one</p>\r\n</div>'
    tree = parse(original, capture_spans=True)
    p = _find(tree, lambda n: isinstance(n, Element) and n.name == "p")
    plan = compute_patch(original, [
        {"kind": "setAttr", "target": _nid(tree, p), "name": "class",
         "value": "y"}])
    assert apply_patch_plan(original, plan) == \
        '<div>\r\n<p class="y">one</p>\r\n</div>'


def test_apply_patch_plan_validates_bounds():
    with pytest.raises(ValueError):
        apply_patch_plan("abc", {"steps": [
            {"kind": "slice", "start": 2, "end": 1}], "result": ""})
    with pytest.raises(ValueError):
        apply_patch_plan("abc", {"steps": [
            {"kind": "insert", "at": 2, "text": "x"}], "result": ""})


# ---------------------------------------------------------------------------
# span location parity (differential-validated vs parse5 sourceCodeLocation
# via tools/ref_oracle/span_oracle.mjs; round 2 closed the two formerly
# known divergence classes — unclosed-rawtext-to-EOF zero-length spans and
# charref-bearing segmented-text end offsets — 6,500 sweep cases fully
# matched, element AND text spans)

def test_implied_close_span_extends_to_closing_cause():
    # <p> closed implicitly by the next <p>: end = start of the closer
    html = "<div><p>one<p>two</p></div>"
    tree = parse(html, capture_spans=True)
    from html_parser_ray.htmlcore.extract import find_all_by_tag_name
    p1, p2 = list(find_all_by_tag_name(tree, "p"))
    assert html[p1.start:p1.end] == "<p>one"
    assert html[p2.start:p2.end] == "<p>two</p>"


def test_unclosed_element_span_ends_at_eof():
    html = "<div><span>tail text"
    tree = parse(html, capture_spans=True)
    from html_parser_ray.htmlcore.extract import find_all_by_tag_name
    span_el = next(find_all_by_tag_name(tree, "span"))
    assert html[span_el.start:span_el.end] == "<span>tail text"


def test_aaa_clone_has_no_span():
    # <b> cloned into the <p> by the adoption agency carries no source span
    html = "<b>1<p>2</b>3</p>"
    tree = parse(html, capture_spans=True)
    from html_parser_ray.htmlcore.extract import find_all_by_tag_name
    bs = list(find_all_by_tag_name(tree, "b"))
    originals = [b for b in bs if b.start >= 0]
    clones = [b for b in bs if b.start < 0]
    assert len(originals) == 1 and len(clones) == 1
    # the original b ends at the matching </b> end tag (parse5 rule)
    assert html[originals[0].start:originals[0].end] == "<b>1<p>2</b>"


def test_unclosed_rawtext_element_gets_zero_length_span():
    # parse5 eofInText pops while currentToken is still the element's own
    # start tag -> zero-length span at the element start (differentially
    # verified vs the vendored fork)
    for html, tag, at in [("<div>x</div><textarea>tail", "textarea", 12),
                          ("<p>ab<title>t-unclosed", "title", 5),
                          ("<b>z<style>ss", "style", 4)]:
        tree = parse(html, capture_spans=True)
        from html_parser_ray.htmlcore.extract import find_all_by_tag_name
        el = next(find_all_by_tag_name(tree, tag))
        assert (el.start, el.end) == (at, at), (html, el.start, el.end)


def test_pre_leading_newline_excluded_from_text_span():
    html = "<pre>\np</pre>"
    tree = parse(html, capture_spans=True)
    from html_parser_ray.htmlcore.extract import find_all_by_tag_name
    pre = next(find_all_by_tag_name(tree, "pre"))
    text = pre.children[0]
    assert (text.start, text.end) == (6, 7)
    assert text.value == "p"


def test_charref_segmented_text_span_ends_at_source_end():
    # 'x &amp;' arrives pre-body and is split ws/non-ws; the merged text
    # node must still end at the charref's SOURCE end (7), not at the
    # decoded-length arithmetic end (3)
    html = "x &amp;<style>"
    tree = parse(html, capture_spans=True)
    from html_parser_ray.htmlcore.dom import Text

    def first_text(node):
        for c in node.children:
            if isinstance(c, Text):
                return c
            got = first_text(c) if hasattr(c, "children") else None
            if got:
                return got
        return None

    text = first_text(tree.children[0])
    assert text.value == "x &"
    assert (text.start, text.end) == (0, 7)


# ---------------------------------------------------------------------------
# parse5 token-boundary anchors for entity-decoded chars: the ws/non-ws
# segmentation boundary sits at the preprocessor position of the char at
# append time — for a decoded charref that is the LAST raw char of the
# reference (parse5 tokenizer _appendCharToCurrentCharacterToken).
# Minimized from the r4 span sweeps; goldens from span_oracle.mjs.

def _spans(html):
    tree = parse(html, capture_spans=True)
    out = []

    def collect(children, path):
        for idx, child in enumerate(children):
            p = f"{path}/{idx}"
            if isinstance(child, Element):
                out.append((p, child.start, child.end))
                inner = (child.template_content
                         if child.template_content is not None
                         else child.children)
                collect(inner, p)
            elif isinstance(child, Text):
                out.append((p, child.start, child.end))

    collect(tree.children, "")
    return out


def test_entity_led_segment_starts_at_reference_last_char():
    # decoded "&x" starts at the ';' of &amp; (offset 5), not at the
    # arithmetic position of the ws boundary
    assert _spans(" &amp;x<style>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 5, 7), ("/0/1/1", 7, 7)]


def test_entity_tab_boundary_mid_run():
    # "a\t b" — the charref tab is ws; boundary positions recovered from
    # the per-part anchors, final text node spans the whole raw run
    assert _spans("a&#9; b<style>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 7), ("/0/1/1", 7, 7)]


def test_adjacent_entities_merge_to_source_end():
    assert _spans("x &amp;&amp;y<style>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 13), ("/0/1/1", 13, 13)]


def test_foreign_end_tag_rewrites_token_name_for_end_span():
    # parse5 endTagInForeignContent rewrites the token tagName to the
    # element's adjusted name before popping, so _setEndLocation stamps
    # foreignObject's END at </foreignObject>'s end, not the ignored
    # </path> token's start
    assert _spans("<svg><foreignObject></path></foreignObject>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 43), ("/0/1/0/0", 5, 43)]


def test_pure_ws_charref_run_after_head_true_source_end():
    # a pure-whitespace run containing a charref keeps its raw source
    # end (18 = end of "&#9;"), pinning head/style positions
    assert _spans("<head></head> &#9;<style>") == [
        ("/0", -1, -1), ("/0/0", 0, 18), ("/0/0/0", 18, 18),
        ("/0/1", 13, 18), ("/0/2", -1, -1)]


def test_pure_ws_charref_run_after_frameset():
    assert _spans("<frameset></frameset> &#9;") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", 0, 21),
        ("/0/2", 21, 26)]


def test_char_token_pop_stamps_last_tag_token_location():
    # parse5 updates parser.currentToken only on start/end tags
    # (parser/index.js:899,1022): colgroup popped by a character token
    # ends at its OWN start tag's start, not at the text position
    assert _spans("<table><colgroup>xy") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 17, 19), ("/0/1/1", 0, 19), ("/0/1/1/0", 7, 7)]
    # with an entity in the popping run (anchored 5-tuple token)
    assert _spans("<table><colgroup>x&amp;y") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 17, 24), ("/0/1/1", 0, 24), ("/0/1/1/0", 7, 7)]


def test_error_span_positional_on_anchored_char_token():
    # error spans stay int 2-tuples even when the current token is an
    # anchored 5-tuple CHARS token, and the PUBLIC stream matches the
    # reference's parse5 report exactly (error_oracle.mjs golden): the
    # tree-level NUL report is internal-only, the tokenizer-level one
    # is zero-width at the NUL
    tree = parse("<body>a\x00&amp;b", capture_spans=True)
    spans = [e.span for e in tree.errors]
    assert all(isinstance(s, tuple) and len(s) == 2
               and all(isinstance(x, int) for x in s) for s in spans)
    assert [(e.parse_error_id, e.span) for e in tree.errors] == [
        ("missing-doctype", (0, 0)),
        ("unexpected-null-character", (7, 7))]


# ---------------------------------------------------------------------------
# parse5 stopParsing / pop-time end-location semantics (r4b sweep grammar:
# frameset, colgroup, form-in-table, templates); goldens from span_oracle.mjs

def test_implied_html_blocks_eof_extension_of_items1():
    # stopParsing extends the items[1] slot (body OR frameset) only when
    # html has a source location — implied <html> leaves the explicit
    # frameset/body at its start-tag end
    assert _spans("<frameset><b>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", 0, 10)]
    assert _spans("<body><frameset><p>x") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", 0, 6),
        ("/0/1/0", 16, 20), ("/0/1/0/0", 19, 20)]
    # with an explicit <html> both html and body extend to EOF
    assert _spans("<html><body>x") == [
        ("/0", 0, 13), ("/0/0", -1, -1), ("/0/1", 6, 13),
        ("/0/1/0", 12, 13)]


def test_eof_in_template_pops_stamp_last_tag_token():
    # eofInTemplate pops the template BEFORE stopParsing; the pop stamps
    # from the last tag token (its own <template> start → zero-width, or
    # the preceding </h1> start)
    assert _spans("<option>o</p><template>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 23), ("/0/1/0/0", 8, 9), ("/0/1/0/1", -1, -1),
        ("/0/1/0/2", 13, 13)]
    assert _spans("<template><h1>h</h1>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/0/0", 0, 15),
        ("/0/0/0/0", 10, 20), ("/0/0/0/0/0", 14, 15), ("/0/1", -1, -1)]


def test_form_in_table_pops_at_own_start():
    # formStartTagInTable pops the just-inserted form while currentToken
    # is still the <form> start tag → zero-width end at its own start
    assert _spans("<table><form>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 13), ("/0/1/0/0", 7, 7)]


def test_eof_terminated_comment_and_doctype_end_past_input():
    # parse5 counts the consumed EOF pseudo-char: an EOF-terminated
    # comment/doctype/bogus-comment ends at n+1
    from html_parser_ray.htmlcore.dom import Comment, Doctype
    t = parse("<!-- unclosed", capture_spans=True)
    c = t.children[0]
    assert isinstance(c, Comment) and (c.start, c.end) == (0, 14)
    t = parse("<!doctype html", capture_spans=True)
    d = t.children[0]
    assert isinstance(d, Doctype) and (d.start, d.end) == (0, 15)
    t = parse("<?pi", capture_spans=True)  # bogus comment
    c = t.children[0]
    assert isinstance(c, Comment) and (c.start, c.end) == (0, 5)
    t = parse("<!doctype html public bogus", capture_spans=True)
    d = t.children[0]
    assert isinstance(d, Doctype) and (d.start, d.end) == (0, 28)
    # a '>'-terminated comment/doctype still ends at the raw '>' end
    t = parse("<!--c--><!doctype html>", capture_spans=True)
    assert (t.children[0].start, t.children[0].end) == (0, 8)
    assert (t.children[1].start, t.children[1].end) == (8, 23)


def test_cdata_text_span_covers_section_markers():
    # parse5 locates CDATA characters from the '<![CDATA[' marker; the
    # merged run spans marker..']]>' and fuses with adjacent text
    from html_parser_ray.htmlcore.dom import Text
    t = parse("<svg>a<![CDATA[x]]></svg>", capture_spans=True)
    svg = t.children[0].children[1].children[0]
    (txt,) = svg.children
    assert isinstance(txt, Text)
    assert txt.value == "ax" and (txt.start, txt.end) == (5, 19)
    # empty section contributes no text node
    t = parse("<svg><![CDATA[]]></svg>", capture_spans=True)
    svg = t.children[0].children[1].children[0]
    assert svg.children == []
    # unclosed section ends at the input end (no EOF pseudo-char here)
    t = parse("<svg><![CDATA[x", capture_spans=True)
    svg = t.children[0].children[1].children[0]
    (txt,) = svg.children
    assert (txt.start, txt.end) == (5, 15)


def test_skip_lf_keeps_ws_token_location():
    # parse5 strips the pre/textarea LF via token.chars.substr(1) WITHOUT
    # adjusting the whitespace token's location: while more whitespace
    # follows, the span still starts at the stripped LF
    assert _spans("<pre>\n  x</pre>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 15), ("/0/1/0/0", 5, 9)]
    assert _spans("<textarea>\n \nx</textarea>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 25), ("/0/1/0/0", 10, 14)]
    assert _spans("<svg><pre>\n x</pre></svg>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 5), ("/0/1/1", 5, 19), ("/0/1/1/0", 10, 13)]


def test_skip_lf_sole_ws_token_advances_to_next_char():
    # when the LF was the ENTIRE whitespace token, the next character
    # token's own creation position takes over — anchor-aware when the
    # LF was entity-decoded (&#10; spans 5..10, x at 10)
    assert _spans("<pre>\nx</pre>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 13), ("/0/1/0/0", 6, 7)]
    assert _spans("<pre>&#10;x</pre>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 17), ("/0/1/0/0", 10, 11)]
    # decoded LF followed by more ws: run start stays at the charref start
    assert _spans("<pre>&#10; x</pre>") == [
        ("/0", -1, -1), ("/0/0", -1, -1), ("/0/1", -1, -1),
        ("/0/1/0", 0, 18), ("/0/1/0/0", 5, 12)]


def test_skip_lf_deferred_lt_append_in_rcdata():
    # a RAW "<" surviving as text in RCDATA is appended only after the
    # tag lookahead fails: its creation position is one past the "<"
    # (two for "</"); entity-decoded "<" is appended at its reference's
    # last raw char and never deferred
    assert _spans("<textarea>\n<b>z</b></textarea>")[-1] == ("/0/1/0/0", 12, 19)
    assert _spans("<textarea>\n</b>x</textarea>")[-1] == ("/0/1/0/0", 13, 16)
    assert _spans("<textarea>\n&lt;x</textarea>")[-1] == ("/0/1/0/0", 14, 16)
    assert _spans("<textarea>\n<&sol;x</textarea>")[-1] == ("/0/1/0/0", 12, 18)
    assert _spans("<textarea>&#10;<b>z</b></textarea>")[-1] == ("/0/1/0/0", 16, 23)
