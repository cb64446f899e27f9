"""Span-based patch planning: map edits over a parsed tree to slice/insert
steps over the ORIGINAL html string.

Parity layer for the reference's computePatch / applyPatchPlan
(reference: src/public/mod.ts:1872-1895 applyPatchPlan,
:1943-2087 buildReplacement + attr surgery, :2089-2174 computePatch;
start-tag close scanning :1829-1866). Edits and steps are plain dicts:

  Edit:  {"kind": "removeNode"|"replaceText"|"setAttr"|"removeAttr"
                 |"insertHtmlBefore"|"insertHtmlAfter",
          "target": node_id, ["value"], ["name"], ["html"]}
  Step:  {"kind": "slice", "start": int, "end": int}
       | {"kind": "insert", "at": int, "text": str}
  Plan:  {"steps": [Step, ...], "result": str}

Spans captured by ``parse(..., capture_spans=True)`` are offsets into the
newline-NORMALIZED text; when the original contained \r\n / \r they are
mapped back to original-string offsets before planning.
"""

from __future__ import annotations

from .api import parse, ParseTree
from .dom import Element, Text
from .tokenizer import normalize_newlines

_WS_CHARS = " \n\t\r\f"


class PatchPlanningError(Exception):
    def __init__(self, payload: dict):
        super().__init__(payload.get("code", "PATCH_PLANNING_ERROR"))
        self.payload = payload


def _fail(code: str, target: int | None = None, detail: str | None = None):
    payload: dict = {"code": code}
    if target is not None:
        payload["target"] = target
    if detail is not None:
        payload["detail"] = detail
    raise PatchPlanningError(payload)


def _escape_text(value: str) -> str:
    return value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attribute(value: str) -> str:
    return value.replace("&", "&amp;").replace('"', "&quot;")


def apply_patch_plan(original_html: str, plan: dict) -> str:
    """Replay slice/insert steps with cursor validation
    (reference: mod.ts:1872-1895)."""
    cursor = 0
    out: list[str] = []
    for step in plan["steps"]:
        if step["kind"] == "slice":
            start, end = step["start"], step["end"]
            if start < cursor or end < start or end > len(original_html):
                raise ValueError("invalid patch slice bounds")
            out.append(original_html[start:end])
            cursor = end
            continue
        if step["at"] != cursor or step["at"] > len(original_html):
            raise ValueError("invalid patch insertion offset")
        out.append(step["text"])
    return "".join(out)


def _find_start_tag_close(html: str, start: int) -> int:
    """Scan from the element's span start for the unquoted '>'
    (reference: findElementStartTagClose mod.ts:1829-1853)."""
    quote: str | None = None
    for idx in range(start, len(html)):
        cur = html[idx]
        if quote is None and cur in "\"'":
            quote = cur
        elif quote is not None and cur == quote:
            quote = None
        elif quote is None and cur == ">":
            return idx
    return -1


def _attr_insert_offset(html: str, close_index: int, tag_start: int) -> int:
    """Back up over whitespace / the self-closing solidus
    (reference: findAttributeInsertOffset mod.ts:1855-1866)."""
    cursor = close_index - 1
    while cursor > tag_start and html[cursor] in _WS_CHARS:
        cursor -= 1
    if html[cursor] == "/":
        return cursor
    return close_index


class _SpanIndex:
    """NodeId → (node, original-string span)."""

    def __init__(self, tree: ParseTree, removed: list[int] | None):
        self.tree = tree
        self.removed = removed

    def _to_original(self, offset: int) -> int:
        if not self.removed:
            return offset
        # each removed position ≤ offset shifts the original right by one
        import bisect
        return offset + bisect.bisect_right(self.removed, offset)

    def node(self, target: int):
        node = self.tree.by_id.get(target)
        if node is None:
            _fail("NODE_NOT_FOUND", target)
        return node

    def span(self, target: int) -> tuple[int, int]:
        node = self.node(target)
        start = getattr(node, "start", -1)
        end = getattr(node, "end", -1)
        if start is None or start < 0 or end is None or end < 0:
            # implied wrappers (html/head/body the parser synthesized) have
            # no source span → "inferred" provenance in the reference
            # (spans-patch.test.js:128-150)
            _fail("NON_INPUT_SPAN_PROVENANCE", target, "inferred")
        return self._to_original(start), self._to_original(end)

    def attr_span(self, el: Element, name: str) -> tuple[int, int] | None:
        if el.attr_spans is None:
            return None
        for (aname, _v), span in zip(el.attrs, el.attr_spans):
            if aname == name:
                if span is None:
                    return None
                return self._to_original(span[0]), self._to_original(span[1])
        return None


def _build_replacement(original: str, index: _SpanIndex, edit: dict,
                       source_index: int) -> tuple[int, int, int, int, str]:
    """→ (start, end, source_index, target, replacement_html)
    (reference: buildReplacement mod.ts:2024-2084)."""
    kind = edit["kind"]
    target = edit["target"]

    if kind == "removeNode":
        start, end = index.span(target)
        return start, end, source_index, target, ""

    if kind == "replaceText":
        node = index.node(target)
        if not isinstance(node, Text):
            _fail("INVALID_EDIT_TARGET", target, "expected text node target")
        start, end = index.span(target)
        return start, end, source_index, target, _escape_text(edit["value"])

    if kind in ("setAttr", "removeAttr"):
        node = index.node(target)
        if not isinstance(node, Element):
            _fail("INVALID_EDIT_TARGET", target, "expected element node target")
        name = edit["name"]
        aspan = index.attr_span(node, name)
        has_attr = any(a[0] == name for a in node.attrs)

        if kind == "setAttr":
            rendered = f'{name}="{_escape_attribute(edit["value"])}"'
            if has_attr:
                if aspan is None:
                    _fail("ATTRIBUTE_SPAN_MISSING", target, name)
                return aspan[0], aspan[1], source_index, target, rendered
            el_start, _el_end = index.span(target)
            close = _find_start_tag_close(original, el_start)
            if close == -1:
                _fail("ELEMENT_START_TAG_NOT_FOUND", target)
            at = _attr_insert_offset(original, close, el_start)
            return at, at, source_index, target, f" {rendered}"

        # removeAttr
        if not has_attr:
            _fail("ATTRIBUTE_NOT_FOUND", target, name)
        if aspan is None:
            _fail("ATTRIBUTE_SPAN_MISSING", target, name)
        el_start, _el_end = index.span(target)
        close = _find_start_tag_close(original, el_start)
        if close == -1:
            _fail("ELEMENT_START_TAG_NOT_FOUND", target)
        start, end = aspan
        while start > el_start + 1 and original[start - 1] in _WS_CHARS:
            start -= 1
        if start == aspan[0]:
            while end < close and original[end] in _WS_CHARS:
                end += 1
        return start, end, source_index, target, ""

    if kind == "insertHtmlBefore":
        start, _end = index.span(target)
        return start, start, source_index, target, edit["html"]

    if kind == "insertHtmlAfter":
        _start, end = index.span(target)
        return end, end, source_index, target, edit["html"]

    _fail("INVALID_EDIT_TARGET", target, f"unknown edit kind {kind!r}")


def compute_patch(original_html: str, edits: list[dict]) -> dict:
    """Plan + apply edits over the original string
    (reference: computePatch mod.ts:2089-2174)."""
    if not edits:
        steps = [{"kind": "slice", "start": 0, "end": len(original_html)}]
        return {"steps": steps, "result": original_html}

    _normalized, removed = normalize_newlines(original_html)
    tree = parse(original_html, capture_spans=True)
    index = _SpanIndex(tree, removed)

    replacements = [
        _build_replacement(original_html, index, edit, i)
        for i, edit in enumerate(edits)
    ]
    replacements.sort(key=lambda r: (r[0], r[1], r[2]))

    previous_end = 0
    for start, end, _si, target, _html in replacements:
        if start < 0 or end < start or end > len(original_html):
            _fail("OVERLAPPING_EDITS", target, "invalid replacement bounds")
        if start < previous_end:
            _fail("OVERLAPPING_EDITS", target)
        previous_end = max(previous_end, end)

    steps: list[dict] = []
    cursor = 0
    for start, end, _si, _target, html in replacements:
        if cursor < start:
            steps.append({"kind": "slice", "start": cursor, "end": start})
        steps.append({"kind": "insert", "at": start, "text": html})
        cursor = end
    if cursor < len(original_html):
        steps.append({"kind": "slice", "start": cursor,
                      "end": len(original_html)})

    result = apply_patch_plan(original_html, {"steps": steps, "result": ""})
    return {"steps": steps, "result": result}
