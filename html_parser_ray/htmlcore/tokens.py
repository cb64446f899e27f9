"""Public tokenize API — token-list output for conformance/debug use.

Mirror of the reference's tokenizer facade (reference: tokenize
src/internal/tokenizer/tokenize.ts:261-267; callbacks :139-259; adjacent
Character-token merging :68-85; public Token mirror src/public/types.ts:93-99):
drives the spec tokenizer to completion and returns public-shape dicts

  {"type": "StartTag", "name", "attributes": {..}, "selfClosing": bool}
  {"type": "EndTag", "name"}
  {"type": "Character", "data"}
  {"type": "Comment", "data"}
  {"type": "Doctype", "name", "publicId", "systemId", "forceQuirks"}
  {"type": "EOF"}

with adjacent Character tokens merged and an EOF token always appended.
``initial_state`` / ``last_start_tag`` support the html5lib-style
initial-state expansions (data / rcdata / rawtext / script_data /
plaintext / cdata).
"""

from __future__ import annotations

from .tokenizer import (
    CHARS, COMMENT, DOCTYPE, END, EOF, START,
    DATA, RCDATA, RAWTEXT, SCRIPT_DATA, PLAINTEXT, CDATA_SECTION,
    Tokenizer, normalize_newlines,
)

_STATES = {
    "data": DATA, "rcdata": RCDATA, "rawtext": RAWTEXT,
    "script_data": SCRIPT_DATA, "plaintext": PLAINTEXT,
    "cdata": CDATA_SECTION,
    # html5lib fixture aliases
    "Data state": DATA, "RCDATA state": RCDATA, "RAWTEXT state": RAWTEXT,
    "Script data state": SCRIPT_DATA, "PLAINTEXT state": PLAINTEXT,
    "CDATA section state": CDATA_SECTION,
}


def tokenize(html: str, *, initial_state: str = "data",
             last_start_tag: str = "",
             max_input_chars: int | None = None) -> list[dict]:
    """Full-input tokenization → public token list (+ merged chars, EOF)."""
    if max_input_chars is not None and len(html) > max_input_chars:
        from .api import BudgetExceededError
        raise BudgetExceededError("maxInputBytes", max_input_chars, len(html))
    state = _STATES.get(initial_state)
    if state is None:
        raise ValueError(f"unknown initial tokenizer state {initial_state!r}")
    text, _removed = normalize_newlines(html)
    tk = Tokenizer(text, initial_state=state, last_start_tag=last_start_tag)
    # CDATA only reachable via foreign content; the explicit initial state
    # opts in for conformance harnesses
    tk.allow_cdata = state == CDATA_SECTION

    out: list[dict] = []
    done = False
    while not done:
        for token in tk.drain():
            kind = token[0]
            if kind == CHARS:
                if out and out[-1]["type"] == "Character":
                    out[-1]["data"] += token[1]
                else:
                    out.append({"type": "Character", "data": token[1]})
            elif kind == START:
                out.append({"type": "StartTag", "name": token[1],
                            "attributes": {a[0]: a[1] for a in token[2]},
                            "selfClosing": bool(token[3])})
            elif kind == END:
                out.append({"type": "EndTag", "name": token[1]})
            elif kind == COMMENT:
                out.append({"type": "Comment", "data": token[1]})
            elif kind == DOCTYPE:
                # reference facade maps a missing name to "" (tokenize.ts)
                out.append({"type": "Doctype", "name": token[1] or "",
                            "publicId": token[2], "systemId": token[3],
                            "forceQuirks": bool(token[4])})
            elif kind == EOF:
                out.append({"type": "EOF"})
                done = True
                break
    return out
