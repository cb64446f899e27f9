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
