"""Trace-channel schema tests (mirror of trace-schema.test.js)."""

from html_parser_ray.htmlcore.api import Budgets, parse, parse_bytes


def test_trace_schema_and_monotonic_seq():
    # the &amp-without-semicolon supplies a parse5-REPORTED error: the
    # public stream (and so the parseError trace) now carries only what
    # the reference's vendored parse5 reports via onParseError — table
    # foster-parenting errors are internal
    tree = parse("<!doctype html>&amp <table><tr><td>a</td></tr>outside"
                 "<tr><td>b</td></tr></table>", trace=True,
                 budgets=Budgets(max_trace_events=128,
                                 max_trace_bytes=32768))
    assert tree.trace
    seen = set()
    prev = 0
    for event in tree.trace:
        assert event["seq"] > prev
        prev = event["seq"]
        seen.add(event["kind"])
        if event["kind"] == "token":
            assert event["count"] >= 0
        elif event["kind"] == "insertionModeTransition":
            assert isinstance(event["fromMode"], str)
            assert isinstance(event["toMode"], str)
            # exact reference event shape (src/public/mod.ts:559-564)
            assert set(event["tokenContext"]) == {
                "type", "tagName", "startOffset", "endOffset"}
        elif event["kind"] == "tree-mutation":
            assert event["nodeCount"] >= 1
            assert event["errorCount"] >= 0
        elif event["kind"] == "parseError":
            assert isinstance(event["parseErrorId"], str)
    assert {"token", "insertionModeTransition", "tree-mutation",
            "parseError"} <= seen


def test_trace_decode_event_appended_for_bytes():
    tree = parse_bytes(b"<meta charset='utf-8'><p>x</p>", trace=True)
    last = tree.trace[-1]
    assert last["kind"] == "decode"
    assert last["encoding"] == "utf-8" and last["sniffSource"] == "meta"


def test_trace_budget_caps_events_not_parse():
    tree = parse("<div>" * 50 + "x", trace=True,
                 budgets=Budgets(max_trace_events=10))
    assert tree.trace[-1]["kind"] == "budget"
    assert tree.trace[-1]["budget"] == "maxTraceEvents"
    assert len(tree.trace) == 11  # 10 events + the closing budget record
    assert tree.n_nodes > 10  # the parse itself is unaffected


def test_trace_off_by_default_and_identical_result():
    from html_parser_ray.htmlcore.normalize import normalize_tree
    html = "<b>1<table><tr>x<td>y</td></tr></table><i>z"
    plain = parse(html)
    traced = parse(html, trace=True)
    assert plain.trace is None
    assert normalize_tree(plain) == normalize_tree(traced)
    assert [e.parse_error_id for e in plain.errors] == \
        [e.parse_error_id for e in traced.errors]


def test_trace_deterministic():
    tree1 = parse("<p>a</p><table><tr><td>b</td></tr></table>", trace=True)
    tree2 = parse("<p>a</p><table><tr><td>b</td></tr></table>", trace=True)
    assert tree1.trace == tree2.trace


def test_mode_transitions_match_reference_instrumentation():
    """Differentially verified vs the vendored parser's
    onInsertionModeTransition (r4: 2,500-case sweep, 0 divergences):
    parse5 mode names, and the token context is the LAST TAG token
    (character/comment/doctype transitions inherit it; null before any
    tag)."""
    tree = parse("<!doctype html><table><tr><td>x", trace=True)
    trans = [(e["fromMode"], e["toMode"], e["tokenContext"]["type"],
              e["tokenContext"]["tagName"])
             for e in tree.trace if e["kind"] == "insertionModeTransition"]
    assert trans == [
        ("INITIAL", "BEFORE_HTML", None, None),
        ("BEFORE_HTML", "BEFORE_HEAD", "START_TAG", "table"),
        ("BEFORE_HEAD", "IN_HEAD", "START_TAG", "table"),
        ("IN_HEAD", "AFTER_HEAD", "START_TAG", "table"),
        ("AFTER_HEAD", "IN_BODY", "START_TAG", "table"),
        ("IN_BODY", "IN_TABLE", "START_TAG", "table"),
        ("IN_TABLE", "IN_TABLE_BODY", "START_TAG", "tr"),
        ("IN_TABLE_BODY", "IN_ROW", "START_TAG", "tr"),
        ("IN_ROW", "IN_CELL", "START_TAG", "td")]


def test_fragment_parse_supports_trace():
    """Reference parity: the fragment path wires the same trace channel
    (mod.ts:689-712); transitions differentially verified (r4: 2,500-case
    doc+fragment sweep vs transition_oracle.mjs, 0 divergences)."""
    from html_parser_ray.htmlcore.api import parse_fragment
    tree = parse_fragment("<tr><td>x", "table", trace=True)
    trans = [(e["fromMode"], e["toMode"]) for e in tree.trace
             if e["kind"] == "insertionModeTransition"]
    assert trans == [
        ("INITIAL", "IN_TABLE"), ("IN_TABLE", "IN_TABLE_BODY"),
        ("IN_TABLE_BODY", "IN_ROW"), ("IN_ROW", "IN_CELL")]
    assert any(e["kind"] == "token" for e in tree.trace)
