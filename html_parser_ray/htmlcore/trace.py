"""Trace emission: seq-numbered structured events for a traced parse.

Mirror of the reference's trace channel (reference: pushTrace /
pushBudgetTrace src/public/mod.ts:193-229, wiring :484-577; event union
src/public/types.ts:158-165; schema asserted by
test/control/trace-schema.test.js): events are dicts

  {"seq", "kind": "decode"|"token"|"insertionModeTransition"|
   "tree-mutation"|"parseError"|"budget"|"stream", ...kind fields}

with strictly increasing ``seq`` and ``maxTraceEvents`` / ``maxTraceBytes``
budgets — when a budget trips, one final ``budget`` event is recorded and
further events are dropped (never an exception; the parse result is
unaffected).

In the Ray pipeline, per-partition counters replace per-document traces
(SURVEY.md §2.2 M11 mapping); this module exists for API parity and
debugging single documents.
"""

from __future__ import annotations

import json

from .tokenizer import END, START
from .treebuilder import TreeBuilder



# our internal camelCase mode strings -> parse5 InsertionMode enum names
# (vendored parser/index.js InsertionMode; insertionModeName reverse map)
_PARSE5_MODE_NAMES = {
    "initial": "INITIAL", "beforeHtml": "BEFORE_HTML",
    "beforeHead": "BEFORE_HEAD", "inHead": "IN_HEAD",
    "inHeadNoscript": "IN_HEAD_NO_SCRIPT", "afterHead": "AFTER_HEAD",
    "inBody": "IN_BODY", "inTable": "IN_TABLE",
    "inTableText": "IN_TABLE_TEXT", "inCaption": "IN_CAPTION",
    "inColumnGroup": "IN_COLUMN_GROUP", "inTableBody": "IN_TABLE_BODY",
    "inRow": "IN_ROW", "inCell": "IN_CELL", "inSelect": "IN_SELECT",
    "inSelectInTable": "IN_SELECT_IN_TABLE", "inTemplate": "IN_TEMPLATE",
    "afterBody": "AFTER_BODY", "inFrameset": "IN_FRAMESET",
    "afterFrameset": "AFTER_FRAMESET", "afterAfterBody": "AFTER_AFTER_BODY",
    "afterAfterFrameset": "AFTER_AFTER_FRAMESET", "text": "TEXT",
}

class TraceSink:
    def __init__(self, max_events: int | None = None,
                 max_bytes: int | None = None):
        self.events: list[dict] = []
        self.max_events = max_events
        self.max_bytes = max_bytes
        self._seq = 0
        self._bytes = 0
        self._closed = False

    def push(self, kind: str, **fields) -> None:
        if self._closed:
            return
        self._seq += 1
        event = {"seq": self._seq, "kind": kind, **fields}
        size = len(json.dumps(event, ensure_ascii=False))
        if self.max_events is not None and len(self.events) >= self.max_events:
            self._close("maxTraceEvents", len(self.events) + 1)
            return
        if self.max_bytes is not None and self._bytes + size > self.max_bytes:
            self._close("maxTraceBytes", self._bytes + size)
            return
        self.events.append(event)
        self._bytes += size

    def _close(self, budget: str, actual: int) -> None:
        self._closed = True
        self.events.append({"seq": self._seq, "kind": "budget",
                            "budget": budget, "actual": actual})


class TracingTreeBuilder(TreeBuilder):
    """TreeBuilder that reports insertion-mode transitions and tree
    mutations to a TraceSink (mode changes intercepted via __setattr__ —
    only this subclass pays the cost)."""

    def __init__(self, sink: TraceSink, **kwargs):
        object.__setattr__(self, "_sink", None)  # silence during __init__
        object.__setattr__(self, "_mutations", 0)
        object.__setattr__(self, "_token_count", 0)
        super().__init__(**kwargs)
        self._sink = sink

    def _dispatch(self, token: tuple) -> None:
        self._token_count += 1
        if token[0] in (START, END):  # parse5 currentToken semantics
            object.__setattr__(self, "_cur_tag_token_any", token)
        super()._dispatch(token)

    def __setattr__(self, name, value):
        if name == "mode":
            sink = getattr(self, "_sink", None)
            if sink is not None:
                old = getattr(self, "mode", None)
                if old is not None and old != value:
                    # reference transition records (vendored parser
                    # _instrumentInsertionModeTransitions +
                    # summarizeTokenContext): parse5 mode NAMES, and the
                    # token context comes from parser.currentToken — which
                    # only START/END tags update, so character/comment/
                    # doctype-driven transitions report the LAST TAG token
                    # (null before any tag)
                    # tokenContext key names mirror the reference's public
                    # event shape exactly (src/public/mod.ts:559-564 nests
                    # them as type/tagName/startOffset/endOffset)
                    token = getattr(self, "_cur_tag_token_any", None)
                    if token is None:
                        ctx = {"type": None, "tagName": None,
                               "startOffset": None, "endOffset": None}
                    else:
                        ctx = {"type": ("START_TAG" if token[0] == START
                                        else "END_TAG"),
                               "tagName": token[1],
                               "startOffset": token[-2],
                               "endOffset": token[-1]}
                    sink.push("insertionModeTransition",
                              fromMode=_PARSE5_MODE_NAMES.get(old, old),
                              toMode=_PARSE5_MODE_NAMES.get(value, value),
                              tokenContext=ctx)
        object.__setattr__(self, name, value)

    def _insert_at(self, place, node) -> None:
        super()._insert_at(place, node)
        sink = self._sink
        if sink is not None:
            self._mutations += 1
            sink.push("tree-mutation", nodeCount=self._mutations,
                      errorCount=len(self.errors))
