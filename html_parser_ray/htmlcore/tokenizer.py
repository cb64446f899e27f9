"""WHATWG HTML5 tokenizer — from-scratch Python implementation.

Spec: https://html.spec.whatwg.org/multipage/parsing.html#tokenization
Behavioral parity target: the reference's tokenizer
(reference: src/internal/vendor/parse5/tokenizer/index.js — studied for
behavior only; this is an independent implementation).

Design notes (scale): per-char state dispatch is too slow for CPython, so every
hot state consumes character RUNS via compiled regexes (text runs, tag/attr
names, quoted values, comment bodies). The tree builder drives the tokenizer
pull-style via ``next_token()`` and may switch ``state`` / ``last_start_tag`` /
``allow_cdata`` between pulls exactly as the spec's tree-construction stage
does.

Offsets are code-point offsets into the (newline-normalized) input text.
"""

from __future__ import annotations

import re
import sys

import numpy as np

from .entities import match_entity, replace_numeric_codepoint

# token kinds
CHARS = 0
START = 1
END = 2
COMMENT = 3
DOCTYPE = 4
EOF = 5

# tokenizer states the tree builder may set
DATA = "data"
RCDATA = "rcdata"
RAWTEXT = "rawtext"
SCRIPT_DATA = "script_data"
PLAINTEXT = "plaintext"
CDATA_SECTION = "cdata"

_DATA_RUN = re.compile(r"[^<&\x00]+")
_RCDATA_RUN = re.compile(r"[^<&\x00]+")
_RAWTEXT_RUN = re.compile(r"[^<\x00]+")
_SCRIPT_RUN = re.compile(r"[^<\x00]+")
_SCRIPT_ESC_RUN = re.compile(r"[^<\-\x00]+")
_PLAINTEXT_RUN = re.compile(r"[^\x00]+")
_CDATA_RUN = re.compile(r"[^\]\x00]+")
_TAG_NAME_RUN = re.compile(r"[^\t\n\f />]+")
_SIMPLE_TAG = re.compile(r"([a-zA-Z][a-zA-Z0-9]*)>")
# whole-tag fast path: name + well-formed attrs with no charrefs / NULs /
# error-producing shapes; anything else falls back to the spec scanner
_FAST_TAG = re.compile(
    r"([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:[\t\n\f ]+[a-zA-Z][-_a-zA-Z0-9:.]*"
    r"(?:=(?:\"[^\"&\x00]*\"|'[^'&\x00]*'|[^\t\n\f >\"'<=`&\x00]+))?)*)"
    r"[\t\n\f ]*(/?)>")
_FAST_ATTR = re.compile(
    r"[\t\n\f ]+([a-zA-Z][-_a-zA-Z0-9:.]*)"
    r"(?:=(?:\"([^\"]*)\"|'([^']*)'|([^\t\n\f >]+)))?")
_ATTR_NAME_RUN = re.compile(r"[^\t\n\f /=>]+")
_ATTR_VALUE_DQ_RUN = re.compile(r'[^"&\x00]+')
_ATTR_VALUE_SQ_RUN = re.compile(r"[^'&\x00]+")
_ATTR_VALUE_UQ_RUN = re.compile(r"[^\t\n\f &>\x00]+")
_COMMENT_RUN = re.compile(r"[^<\-\x00]+")
_WS = "\t\n\f "
_ASCII_LETTERS = re.compile(r"[a-zA-Z]+")
_DIGITS = re.compile(r"[0-9]+")
_HEX_DIGITS = re.compile(r"[0-9a-fA-F]+")
_ALNUM = re.compile(r"[a-zA-Z0-9]")
_DOCTYPE_NAME_RUN = re.compile(r"[^\t\n\f >]+")

_CR = re.compile(r"\r\n?")


def _is_control_cp(cp: int) -> bool:
    # parse5 unicode.js isControlCodePoint: C0 minus TAB/LF/FF/CR (and NUL,
    # handled by the states), plus DEL..C1
    return ((0x01 <= cp <= 0x1F and cp not in (0x09, 0x0A, 0x0C, 0x0D))
            or 0x7F <= cp <= 0x9F)


def _is_noncharacter(cp: int) -> bool:
    return 0xFDD0 <= cp <= 0xFDEF or (cp & 0xFFFE) == 0xFFFE


# input-stream character classes reported by the parse5 preprocessor at
# consumption time (control / noncharacter / surrogate); \r never fires
# (CR is in parse5's common-valid fast range) so newline normalization
# upstream is observation-equivalent. PERF: astral chars in a regex
# class defeat re's fast scan (~25 MB/s vs ~250 MB/s measured), so the
# class is BMP-only and astral noncharacters (U+xFFFE/U+xFFFF per
# plane) are found by a single vectorized pass that runs only when the
# string's storage kind can hold astral code points at all: a CPython
# UCS-4 str stores >= 4 bytes per char, so sys.getsizeof(text) >=
# 4*len(text) has no false negatives (UCS-1/2 strings of <= ~38 chars
# may false-positive into the scan, which is then trivially cheap).
_INPUT_STREAM_BAD_BMP = re.compile(
    "[\x01-\x08\x0b\x0e-\x1f\x7f-\x9f"
    "\ufdd0-\ufdef\ud800-\udfff\ufffe\uffff]")


def scan_input_stream_errors(text: str) -> list[tuple[str, int]]:
    """(code, offset) for every problematic input char, in position order."""
    out = []
    for m in _INPUT_STREAM_BAD_BMP.finditer(text):
        cp = ord(m.group())
        if 0xD800 <= cp <= 0xDFFF:
            out.append(("surrogate-in-input-stream", m.start()))
        elif _is_noncharacter(cp):
            out.append(("noncharacter-in-input-stream", m.start()))
        else:
            out.append(("control-character-in-input-stream", m.start()))
    if text and sys.getsizeof(text) >= 4 * len(text):  # may be UCS-4
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        hits = np.nonzero(((cps & 0xFFFE) == 0xFFFE) & (cps > 0xFFFF))[0]
        if hits.size:
            out.extend(("noncharacter-in-input-stream", int(i))
                       for i in hits)
            out.sort(key=lambda t: t[1])
    return out

# spec case folding is ASCII-only: <pathß ÅÉ> keeps its non-ASCII chars
# verbatim (Python str.lower() would unicode-fold them)
_ASCII_LOWER_TABLE = {c: c + 32 for c in range(ord("A"), ord("Z") + 1)}


def _ascii_lower(value: str) -> str:
    if value.isascii():
        return value.lower()
    return value.translate(_ASCII_LOWER_TABLE)

# start tags after which the tree builder may switch the tokenizer state
# (rawtext/RCDATA/script/plaintext) or enter foreign content (CDATA gating)
_SWITCH_TAGS = frozenset([
    "title", "textarea", "style", "xmp", "iframe", "noembed", "noframes",
    "script", "noscript", "plaintext", "svg", "math",
])


def normalize_newlines(html: str) -> tuple[str, list[int] | None]:
    """\\r\\n / \\r → \\n (spec input preprocessing).

    Returns (normalized, removed_positions) where removed_positions are the
    normalized-string offsets at which a char was dropped (for span mapping
    back to the original string); None when nothing was removed.
    """
    if "\r" not in html:
        return html, None
    out = _CR.sub("\n", html)
    if len(out) == len(html):
        return out, None
    removed: list[int] = []
    delta = 0
    idx = html.find("\r\n")
    while idx != -1:
        removed.append(idx - delta)
        delta += 1
        idx = html.find("\r\n", idx + 2)
    return out, removed


class Tokenizer:
    """Pull-based spec tokenizer over a decoded, newline-normalized string."""

    __slots__ = (
        "html", "n", "pos", "state", "last_start_tag", "allow_cdata",
        "single_step", "_queue", "_qidx", "_text_parts", "_text_start",
        "_text_starts", "_text_ends", "_text_anchor", "errors",
        "emission_errors",
        "capture_offsets",
        "_track_starts",
        "_initial_state_override", "_cdata_start",
    )

    def __init__(self, html: str, capture_offsets: bool = False,
                 initial_state: str = DATA, last_start_tag: str = ""):
        self.html = html
        self.n = len(html)
        self.pos = 0
        self.state = initial_state
        self.last_start_tag = last_start_tag
        self.allow_cdata = False
        # set by the tree builder while foreign content is on the stack:
        # any popped end tag may re-enable CDATA, so run-ahead must stop
        # after every token
        self.single_step = False
        self._queue: list[tuple] = []
        self._qidx = 0
        self._text_parts: list[str] = []
        self._text_starts: list[int] = []
        self._text_ends: list[int] = []
        self._text_start = 0
        # parse5 character-token location semantics: a construct that
        # is DROPPED without emitting (</> missing-end-tag-name) leaves
        # its start position as the anchor for the NEXT character token
        # (and text node) — cleared by any real token emission
        self._text_anchor: int | None = None
        self.errors: list[tuple[str, int]] = []  # (code, offset)
        # end-tag-with-attributes / -trailing-solidus fire at token
        # EMISSION in parse5 (_emitCurrentTagToken), i.e. chronologically
        # AFTER the pending character token is flushed and processed;
        # the tree builder splices these into the public stream per token
        self.emission_errors: list[tuple[str, int]] = []
        self.capture_offsets = capture_offsets
        # per-part start bookkeeping feeds the segmentation anchors. It is
        # needed whenever a text run's raw extent differs from its decoded
        # length (charrefs, CDATA): the PUBLIC ERROR STREAM's keys/spans
        # depend on anchor-exact boundaries even with span capture off, so
        # tracking switches on lazily at the first charref/CDATA in a run
        # (_ensure_starts backfills the contiguous plain prefix).
        self._track_starts = capture_offsets
        self._cdata_start = -1  # '<![CDATA[' marker start of an open section

    # ---- error + text plumbing -------------------------------------------

    def _err(self, code: str, offset: int | None = None) -> None:
        self.errors.append((code, self.pos if offset is None else offset))

    def _text(self, value: str, start: int, raw_end: int = -1) -> None:
        """Append text; raw_end is the raw extent for parts whose source
        is wider than the value (charrefs, CDATA) — default: start+len."""
        if value:
            if not self._text_parts:
                anchor = self._text_anchor
                if anchor is not None:
                    self._text_anchor = None
                    self._text_start = anchor
                else:
                    self._text_start = start
            self._text_parts.append(value)
            if self._track_starts:
                self._text_starts.append(start)
                self._text_ends.append(
                    start + len(value) if raw_end < 0 else raw_end)

    def _ensure_starts(self) -> None:
        """Begin per-part start/end tracking mid-run: every part so far is
        plain contiguous text (raw == decoded), so extents reconstruct
        arithmetically from the run start."""
        if not self._track_starts:
            starts, ends = [], []
            p = self._text_start
            for part in self._text_parts:
                starts.append(p)
                p += len(part)
                ends.append(p)
            self._text_starts = starts
            self._text_ends = ends
            self._track_starts = True

    def _flush_text(self, end: int) -> None:
        parts = self._text_parts
        if parts:
            data = "".join(parts)
            start = self._text_start
            if self._track_starts and end - start != len(data):
                # the run contains decoded character references (raw longer
                # than decoded). parse5 places ws/non-ws character-token
                # boundaries at the preprocessor position of the boundary
                # char — for an entity-decoded char that is the LAST raw
                # char of the reference (tokenizer/index.js
                # _appendCharToCurrentCharacterToken: getCurrentLocation(0)
                # at append time). Record per-part anchors so the tree
                # builder can recover those positions when it segments a
                # mixed run: (decoded_index, raw_start, raw_last_or_-1).
                starts = self._text_starts
                ends = self._text_ends
                anchors = []
                d = 0
                for i, p in enumerate(parts):
                    raw_start = starts[i]
                    raw_end = ends[i]
                    anchors.append(
                        (d, raw_start,
                         -1 if raw_end - raw_start == len(p)
                         else raw_end - 1))
                    d += len(p)
                token = (CHARS, data, start, end, tuple(anchors))
            else:
                token = (CHARS, data, start, end)
            self._text_parts = []
            self._text_starts = []
            self._text_ends = []
            self._track_starts = self.capture_offsets
            self._queue.append(token)

    def _emit(self, token: tuple) -> None:
        if self._text_parts:
            self._flush_text(token[-2] if len(token) > 2 else self.pos)
        self._text_anchor = None
        self._queue.append(token)

    # ---- public pull API --------------------------------------------------

    def next_token(self) -> tuple:
        while self._qidx >= len(self._queue):
            if self._qidx:
                del self._queue[:self._qidx]
                self._qidx = 0
            self._step()
        token = self._queue[self._qidx]
        self._qidx += 1
        return token

    def drain(self) -> list[tuple]:
        """Return all currently queued tokens (producing at least one).

        Safe for the tree builder because run-ahead stops at every token that
        could require a tokenizer-state change before further tokenization.
        """
        if self._qidx >= len(self._queue):
            if self._qidx:
                del self._queue[:self._qidx]
                self._qidx = 0
            while not self._queue:
                self._step()
        out = self._queue[self._qidx:]
        self._queue = []
        self._qidx = 0
        return out

    def tokens(self) -> list[tuple]:
        """Run to EOF and return every token (conformance/testing helper)."""
        out = []
        while True:
            tok = self.next_token()
            out.append(tok)
            if tok[0] == EOF:
                return out

    # ---- main dispatch ----------------------------------------------------

    def _step(self) -> None:
        state = self.state
        if state == DATA:
            self._run_data()
        elif state == RCDATA:
            self._run_rcdata()
        elif state == RAWTEXT:
            self._run_rawtext()
        elif state == SCRIPT_DATA:
            self._run_script_data()
        elif state == PLAINTEXT:
            self._run_plaintext()
        elif state == CDATA_SECTION:
            self._run_cdata()
        else:  # pragma: no cover
            raise AssertionError(f"bad tokenizer state {state}")

    def _eof(self) -> None:
        self._flush_text(self.pos)
        self._queue.append((EOF,))

    # ---- DATA -------------------------------------------------------------

    def _run_data(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        # run-ahead: keep tokenizing in DATA until the queue has a healthy
        # batch, EXCEPT right after a start tag that lets the tree builder
        # switch tokenizer state (rawtext/script/plaintext/foreign-content
        # roots) or while CDATA is possible (foreign content) — then the
        # builder must see each token before the next is produced.
        target = self._qidx + (1 if (self.allow_cdata or self.single_step) else 32)
        while pos < n:
            m = _DATA_RUN.match(s, pos)
            if m:
                # inline _text for the always-non-empty run (hot path)
                parts = self._text_parts
                if not parts:
                    anchor = self._text_anchor
                    if anchor is not None:
                        self._text_anchor = None
                        self._text_start = anchor
                    else:
                        self._text_start = pos
                parts.append(m.group())
                end = m.end()
                if self._track_starts:
                    self._text_starts.append(pos)
                    self._text_ends.append(end)
                pos = end
                if pos >= n:
                    break
            c = s[pos]
            if c == "<":
                # inline fast path for the common no-attribute tags — one
                # regex + queue append, no _tag_open/_scan_tag frames
                m = _SIMPLE_TAG.match(s, pos + 1)
                if m:
                    name = m.group(1).lower()
                    end = m.end()
                    if self._text_parts:
                        self._flush_text(pos)
                    self._text_anchor = None
                    self._queue.append((START, name, [], False, pos, end))
                    self.last_start_tag = name
                    pos = end
                    if name in _SWITCH_TAGS or len(self._queue) >= target:
                        self.pos = pos
                        return
                    continue
                if s.startswith("</", pos):
                    m = _SIMPLE_TAG.match(s, pos + 2)
                    if m:
                        name = m.group(1).lower()
                        end = m.end()
                        if self._text_parts:
                            self._flush_text(pos)
                        self._text_anchor = None
                        self._queue.append((END, name, pos, end))
                        pos = end
                        if len(self._queue) >= target:
                            self.pos = pos
                            return
                        continue
                self.pos = pos
                self._tag_open(pos)
                pos = self.pos
                if self.state != DATA:
                    return
                queue = self._queue
                if len(queue) >= target:
                    return
                if queue and queue[-1][0] == START and queue[-1][1] in _SWITCH_TAGS:
                    return
            elif c == "&":
                decoded, newpos = self._charref(pos + 1, in_attr=False)
                if decoded is None:
                    self._text("&", pos)
                else:
                    self._text(decoded, pos, newpos)
                pos = newpos
            else:  # NUL
                self._err("unexpected-null-character", pos)
                self._text("\x00", pos)
                pos += 1
        self.pos = pos
        self._eof()

    # ---- RCDATA / RAWTEXT / PLAINTEXT ------------------------------------

    def _run_rcdata(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        while pos < n:
            m = _RCDATA_RUN.match(s, pos)
            if m:
                self._text(m.group(), pos)
                pos = m.end()
                if pos >= n:
                    break
            c = s[pos]
            if c == "<":
                newpos = self._rawtext_lt(pos, allow_charref=True)
                if newpos is None:
                    return  # end tag emitted; state switched to DATA
                pos = newpos
            elif c == "&":
                decoded, newpos = self._charref(pos + 1, in_attr=False)
                if decoded is None:
                    self._text("&", pos)
                else:
                    self._text(decoded, pos, newpos)
                pos = newpos
            else:
                self._err("unexpected-null-character", pos)
                self._text("�", pos)
                pos += 1
        self.pos = pos
        self._eof()

    def _run_rawtext(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        while pos < n:
            m = _RAWTEXT_RUN.match(s, pos)
            if m:
                self._text(m.group(), pos)
                pos = m.end()
                if pos >= n:
                    break
            c = s[pos]
            if c == "<":
                newpos = self._rawtext_lt(pos, allow_charref=False)
                if newpos is None:
                    return
                pos = newpos
            else:
                self._err("unexpected-null-character", pos)
                self._text("�", pos)
                pos += 1
        self.pos = pos
        self._eof()

    def _run_plaintext(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        while pos < n:
            m = _PLAINTEXT_RUN.match(s, pos)
            if m:
                self._text(m.group(), pos)
                pos = m.end()
            else:
                self._err("unexpected-null-character", pos)
                self._text("�", pos)
                pos += 1
        self.pos = pos
        self._eof()

    def _rawtext_lt(self, lt_pos: int, allow_charref: bool) -> int | None:
        """Handle '<' in RCDATA/RAWTEXT. Returns new pos to continue text
        scanning, or None if an appropriate end tag was emitted."""
        s, n = self.html, self.n
        pos = lt_pos + 1
        if pos < n and s[pos] == "/":
            m = _ASCII_LETTERS.match(s, pos + 1)
            if m and m.group().lower() == self.last_start_tag:
                after = m.end()
                if after >= n:
                    pass  # EOF mid-candidate: falls through to text
                elif s[after] in "\t\n\f />":
                    # appropriate end tag: parse the tail like a normal end tag
                    self.pos = pos + 1
                    self._scan_tag(lt_pos, is_end=True)
                    self.state = DATA
                    return None
            # not an appropriate end tag: '</' + letters are just text
            self._text("</", lt_pos)
            return pos + 1
        self._text("<", lt_pos)
        return pos

    # ---- SCRIPT DATA (incl. escape states) --------------------------------

    def _run_script_data(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        while pos < n:
            m = _SCRIPT_RUN.match(s, pos)
            if m:
                self._text(m.group(), pos)
                pos = m.end()
                if pos >= n:
                    break
            c = s[pos]
            if c == "<":
                nxt = s[pos + 1] if pos + 1 < n else ""
                if nxt == "/":
                    m = _ASCII_LETTERS.match(s, pos + 2)
                    if m and m.group().lower() == self.last_start_tag:
                        after = m.end()
                        if after < n and s[after] in "\t\n\f />":
                            self.pos = pos + 2
                            self._scan_tag(pos, is_end=True)
                            self.state = DATA
                            return
                    self._text("</", pos)
                    pos += 2
                elif nxt == "!":
                    self._text("<!", pos)
                    pos += 2
                    if s.startswith("--", pos):
                        self._text("--", pos)
                        pos += 2
                        pos = self._script_escaped(pos)
                        if pos is None:
                            return
                        if pos >= n:
                            break
                else:
                    self._text("<", pos)
                    pos += 1
            else:
                self._err("unexpected-null-character", pos)
                self._text("�", pos)
                pos += 1
        self.pos = pos
        self._eof()

    def _script_escaped(self, pos: int) -> int | None:
        """Script data escaped / double-escaped states. Entered right after
        '<!--'. Returns pos after '-->' (back to plain script data), or None
        if an appropriate end tag was emitted, or n at EOF."""
        s, n = self.html, self.n
        double = False
        # '<!--' lands in the escaped-dash-dash state, so an immediate '>'
        # ('<script><!-->') returns to plain script data per spec.
        dashes = 2
        while pos < n:
            c = s[pos]
            if c == "-":
                self._text("-", pos)
                pos += 1
                dashes += 1
                continue
            if c == ">" and dashes >= 2:
                self._text(">", pos)
                return pos + 1
            if c == "<":
                nxt = s[pos + 1] if pos + 1 < n else ""
                if not double and nxt == "/":
                    m = _ASCII_LETTERS.match(s, pos + 2)
                    if m and m.group().lower() == self.last_start_tag:
                        after = m.end()
                        if after < n and s[after] in "\t\n\f />":
                            self.pos = pos + 2
                            self._scan_tag(pos, is_end=True)
                            self.state = DATA
                            return None
                    self._text("</", pos)
                    pos += 2
                elif not double:
                    # check for double-escape start: '<script' then ws//>
                    m = _ASCII_LETTERS.match(s, pos + 1)
                    self._text("<", pos)
                    pos += 1
                    if m and m.group().lower() == "script":
                        after = m.end()
                        if after < n and s[after] in "\t\n\f />":
                            double = True
                elif nxt == "/":
                    m = _ASCII_LETTERS.match(s, pos + 2)
                    self._text("</", pos)
                    pos += 2
                    if m and m.group().lower() == "script":
                        after = m.end()
                        if after < n and s[after] in "\t\n\f />":
                            double = False
                else:
                    self._text("<", pos)
                    pos += 1
                dashes = 0
            elif c == "\x00":
                self._err("unexpected-null-character", pos)
                self._text("�", pos)
                pos += 1
                dashes = 0
            else:
                m = _SCRIPT_ESC_RUN.match(s, pos)
                self._text(m.group(), pos)
                pos = m.end()
                dashes = 0
        self._err("eof-in-script-html-comment-like-text", n)
        return pos

    # ---- CDATA ------------------------------------------------------------

    def _run_cdata(self) -> None:
        s, n = self.html, self.n
        pos = self.pos
        start = self._cdata_start if self._cdata_start >= 0 else pos
        self._cdata_start = -1
        self._ensure_starts()  # CDATA parts are raw-wider than decoded
        end = s.find("]]>", pos)
        if end == -1:
            self._err("eof-in-cdata", n)
            self._text(s[pos:], start, n)
            self.pos = n
            self._eof()
            return
        self._text(s[pos:end], start, end + 3)
        self.pos = end + 3
        self.state = DATA
        # no eager flush: parse5 keeps the character token open across the
        # CDATA end, so its END location comes from the next real token's
        # flush — which covers a dropped construct ("</>") in between
        # (r5 span sweep); adjacent CHARS merge in the builder either way

    # ---- tag open dispatch -------------------------------------------------

    def _tag_open(self, lt_pos: int) -> bool:
        """Handle '<' in DATA. self.pos updated. Returns True if a token was
        emitted (or queue advanced)."""
        s, n = self.html, self.n
        pos = lt_pos + 1
        if pos >= n:
            self._err("eof-before-tag-name", pos)
            self._text("<", lt_pos)
            self.pos = n
            self._eof()
            return True
        c = s[pos]
        if c == "!":
            self.pos = pos + 1
            self._markup_declaration(lt_pos)
            return True
        if c == "/":
            pos += 1
            if pos >= n:
                self._err("eof-before-tag-name", pos)
                self._text("</", lt_pos)
                self.pos = n
                self._eof()
                return True
            c2 = s[pos]
            if c2.isascii() and c2.isalpha():
                self.pos = pos
                self._scan_tag(lt_pos, is_end=True)
                return True
            if c2 == ">":
                self._err("missing-end-tag-name", pos)
                # the dropped "</>" anchors the next character token at its
                # '<' (and widens a pending run's raw extents): begin exact
                # part tracking and leave the anchor for _text
                self._ensure_starts()
                if not self._text_parts and self._text_anchor is None:
                    self._text_anchor = lt_pos
                self.pos = pos + 1
                return False
            self._err("invalid-first-character-of-tag-name", pos)
            self.pos = pos
            self._bogus_comment(lt_pos)
            return True
        if c.isascii() and c.isalpha():
            self.pos = pos
            self._scan_tag(lt_pos, is_end=False)
            return True
        if c == "?":
            self._err("unexpected-question-mark-instead-of-tag-name", pos)
            self.pos = pos
            self._bogus_comment(lt_pos)
            return True
        self._err("invalid-first-character-of-tag-name", pos)
        self._text("<", lt_pos)
        self.pos = pos
        return False

    # ---- start/end tag scanning -------------------------------------------

    def _scan_tag(self, lt_pos: int, is_end: bool) -> None:
        """Scan tag name + attributes + close. self.pos at first name char."""
        s, n = self.html, self.n
        pos = self.pos
        # fast path: plain `name>` with no attributes / solidus / NULs
        m = _SIMPLE_TAG.match(s, pos)
        if m:
            name = m.group(1).lower()
            end = m.end()
            self.pos = end
            if is_end:
                self._emit((END, name, lt_pos, end))
            else:
                self.last_start_tag = name
                self._emit((START, name, [], False, lt_pos, end))
            return
        if not is_end:
            m = _FAST_TAG.match(s, pos)
            if m:
                name = m.group(1).lower()
                end = m.end()
                attrs = []
                seen: set[str] = set()
                base = m.start(2)
                for am in _FAST_ATTR.finditer(m.group(2)):
                    aname = am.group(1).lower()
                    if aname in seen:
                        self._err("duplicate-attribute", base + am.end(1))
                        continue
                    seen.add(aname)
                    value = am.group(2)
                    if value is None:
                        value = am.group(3)
                    if value is None:
                        value = am.group(4)
                    if value is None:
                        value = ""
                    attrs.append((aname, value, base + am.start(1),
                                  base + am.end()))
                self.pos = end
                self.last_start_tag = name
                self._emit((START, name, attrs, m.group(3) == "/",
                            lt_pos, end))
                return
        m = _TAG_NAME_RUN.match(s, pos)
        name = m.group() if m else ""
        if "\x00" in name:                 # parse5: one error per NUL, at it
            i = name.find("\x00")
            while i != -1:
                self._err("unexpected-null-character", pos + i)
                i = name.find("\x00", i + 1)
            name = name.replace("\x00", "�")
        pos = m.end() if m else pos
        name = _ascii_lower(name)

        attrs: list[tuple[str, str, int, int]] = []
        seen: set[str] = set()
        self_closing = False

        while True:
            # before attribute name
            while pos < n and s[pos] in _WS:
                pos += 1
            if pos >= n:
                self._err("eof-in-tag", pos)
                self.pos = n
                self._eof()
                return
            c = s[pos]
            if c == ">":
                pos += 1
                break
            if c == "/":
                if pos + 1 >= n:
                    # EOF in self-closing-start-tag state: only eof-in-tag
                    # is reported (parse5 _stateSelfClosingStartTag)
                    pos += 1
                    continue
                if s[pos + 1] == ">":
                    self_closing = True
                    pos += 2
                    break
                # parse5 reports at the char FOLLOWING the offending '/'
                self._err("unexpected-solidus-in-tag", pos + 1)
                pos += 1
                continue
            if c == "=":
                self._err("unexpected-equals-sign-before-attribute-name", pos)
                # spec: start the attr name WITH the '=', then continue in
                # attribute-name state — after-name handling (ws* then '='
                # for a value, else empty value) is the normal one
                astart = pos
                pos += 1
                m = _ATTR_NAME_RUN.match(s, pos)
                aname = "=" + (m.group() if m else "")
                pos = m.end() if m else pos
                aname = aname.lower().replace("\x00", "�")
                ws_end = pos
                while ws_end < n and s[ws_end] in _WS:
                    ws_end += 1
                if ws_end < n and s[ws_end] == "=":
                    pos, value, aend = self._attr_value(ws_end)
                else:
                    value, aend = "", pos
                if aname in seen:
                    self._err("duplicate-attribute", astart + len(aname))
                else:
                    seen.add(aname)
                    attrs.append((aname, value, astart, aend))
                continue
            # attribute name
            astart = pos
            m = _ATTR_NAME_RUN.match(s, pos)
            if m:
                aname = m.group()
                pos = m.end()
            else:
                aname = ""
            if ("\x00" in aname or '"' in aname or "'" in aname
                    or "<" in aname):
                # parse5 reports one error PER offending char, at the char
                for i, ch in enumerate(aname):
                    if ch == "\x00":
                        self._err("unexpected-null-character", astart + i)
                    elif ch in "\"'<":
                        self._err("unexpected-character-in-attribute-name",
                                  astart + i)
                aname = aname.replace("\x00", "�")
            aname = _ascii_lower(aname)
            # after attribute name: ws* then '=', or next attr / close
            ws_end = pos
            while ws_end < n and s[ws_end] in _WS:
                ws_end += 1
            if ws_end < n and s[ws_end] == "=":
                pos = ws_end
                pos, value, aend = self._attr_value(pos)
            else:
                value, aend = "", pos
            if aname in seen:
                self._err("duplicate-attribute", astart + len(aname))
            else:
                seen.add(aname)
                attrs.append((aname, value, astart, aend))

        self.pos = pos
        if is_end:
            if attrs:
                self.emission_errors.append(
                    ("end-tag-with-attributes", pos - 1))
            if self_closing:
                self.emission_errors.append(
                    ("end-tag-with-trailing-solidus", pos - 1))
            self._emit((END, name, lt_pos, pos))
        else:
            self.last_start_tag = name
            self._emit((START, name, attrs, self_closing, lt_pos, pos))

    def _attr_value(self, pos: int) -> tuple[int, str, int]:
        """self at '='. Returns (new_pos, value, value_end_offset)."""
        s, n = self.html, self.n
        pos += 1  # consume '='
        while pos < n and s[pos] in _WS:
            pos += 1
        if pos >= n:
            return pos, "", pos
        c = s[pos]
        parts: list[str] = []
        if c == '"' or c == "'":
            run = _ATTR_VALUE_DQ_RUN if c == '"' else _ATTR_VALUE_SQ_RUN
            quote = c
            pos += 1
            while pos < n:
                m = run.match(s, pos)
                if m:
                    parts.append(m.group())
                    pos = m.end()
                    if pos >= n:
                        break
                ch = s[pos]
                if ch == quote:
                    pos += 1
                    # after-quoted-value: caller handles ws / '>' / '/'
                    if pos < n and s[pos] not in "\t\n\f >/":
                        self._err("missing-whitespace-between-attributes", pos)
                    return pos, "".join(parts), pos
                if ch == "&":
                    decoded, newpos = self._charref(pos + 1, in_attr=True)
                    parts.append("&" if decoded is None else decoded)
                    pos = newpos
                else:  # NUL
                    self._err("unexpected-null-character", pos)
                    parts.append("�")
                    pos += 1
            # EOF inside the quoted value: the attribute loop's own
            # pos >= n check reports the single eof-in-tag
            return pos, "".join(parts), pos
        # unquoted
        start = pos
        while pos < n:
            m = _ATTR_VALUE_UQ_RUN.match(s, pos)
            if m:
                chunk = m.group()
                if any(q in chunk for q in "\"'<=`"):
                    # parse5: one error PER offending char, at the char
                    for i, q in enumerate(chunk):
                        if q in "\"'<=`":
                            self._err("unexpected-character-in-unquoted-"
                                      "attribute-value", pos + i)
                parts.append(chunk)
                pos = m.end()
                if pos >= n:
                    break
            ch = s[pos]
            if ch in "\t\n\f >":
                break
            if ch == "&":
                decoded, newpos = self._charref(pos + 1, in_attr=True)
                parts.append("&" if decoded is None else decoded)
                pos = newpos
            else:  # NUL
                self._err("unexpected-null-character", pos)
                parts.append("�")
                pos += 1
        if pos == start:
            self._err("missing-attribute-value", pos)
        return pos, "".join(parts), pos

    # ---- character references ---------------------------------------------

    def _charref(self, pos: int, in_attr: bool) -> tuple[str | None, int]:
        """pos = index after '&'. Returns (decoded or None, new_pos)."""
        s, n = self.html, self.n
        if pos >= n:
            return None, pos
        c = s[pos]
        if c == "#":
            pos += 1
            hex_mode = pos < n and s[pos] in "xX"
            if hex_mode:
                m = _HEX_DIGITS.match(s, pos + 1)
            else:
                m = _DIGITS.match(s, pos)
            if not m:
                # parse5 reports at the first non-digit char: in hex mode
                # the 'x' has already been consumed, so that's pos + 1
                self._err("absence-of-digits-in-numeric-character-reference",
                          pos + 1 if hex_mode else pos)
                return None, pos - 1  # re-scan '#...' as text after the '&'
            digits = m.group()
            newpos = m.end()
            if newpos < n and s[newpos] == ";":
                newpos += 1
            else:
                self._err("missing-semicolon-after-character-reference", newpos)
            if not in_attr:
                # a decode makes the run's raw extent differ from its
                # decoded length: begin exact part tracking (anchors)
                self._ensure_starts()
            value = int(digits, 16 if hex_mode else 10)
            if value == 0:
                self._err("null-character-reference", newpos)
            elif value > 0x10FFFF:
                self._err("character-reference-outside-unicode-range", newpos)
                value = 0x110000
            elif 0xD800 <= value <= 0xDFFF:
                self._err("surrogate-character-reference", newpos)
            elif _is_noncharacter(value):
                self._err("noncharacter-character-reference", newpos)
            elif value == 0x0D or _is_control_cp(value):
                self._err("control-character-reference", newpos)
            return replace_numeric_codepoint(value), newpos
        matched = match_entity(s, pos)
        if matched is None:
            return None, pos
        name, chars = matched
        end = pos + len(name)
        if not name.endswith(";"):
            if in_attr and end < n and (s[end] == "=" or _ALNUM.match(s, end)):
                # legacy rule: do not decode inside attributes when followed
                # by '=' or alphanumeric
                return "&" + name, end
            self._err("missing-semicolon-after-character-reference", end)
        if not in_attr:
            self._ensure_starts()
        return chars, end

    # ---- markup declarations ----------------------------------------------

    def _markup_declaration(self, lt_pos: int) -> None:
        """self.pos right after '<!'."""
        s, n = self.html, self.n
        pos = self.pos
        if s.startswith("--", pos):
            self.pos = pos + 2
            self._comment(lt_pos)
            return
        if s[pos:pos + 7].lower() == "doctype":
            self.pos = pos + 7
            self._doctype(lt_pos)
            return
        if s.startswith("[CDATA[", pos):
            if self.allow_cdata:
                self.pos = pos + 7
                self.state = CDATA_SECTION
                # parse5 locates CDATA characters from the section marker:
                # the run's span covers '<![CDATA[' .. ']]>' inclusive
                self._cdata_start = lt_pos
                self._flush_text(lt_pos)
                if self._qidx >= len(self._queue):
                    self._run_cdata()
                return
            # parse5 errs after consuming '[CDATA[' (last '[' position)
            self._err("cdata-in-html-content", pos + 6)
            self.pos = pos + 7
            self._bogus_comment(lt_pos, initial="[CDATA[")
            return
        self._err("incorrectly-opened-comment", pos)
        self.pos = pos
        self._bogus_comment(lt_pos)

    def _bogus_comment(self, lt_pos: int, initial: str = "") -> None:
        s, n = self.html, self.n
        pos = self.pos
        end = s.find(">", pos)
        if end == -1:
            data = initial + s[pos:]
            self.pos = n
            data = data.replace("\x00", "�")
            self._emit((COMMENT, data, lt_pos, n + 1))
            self._eof()
            return
        data = initial + s[pos:end]
        data = data.replace("\x00", "�")
        self.pos = end + 1
        self._emit((COMMENT, data, lt_pos, end + 1))

    def _comment(self, lt_pos: int) -> None:
        """Spec comment states. self.pos right after '<!--'."""
        s, n = self.html, self.n
        pos = self.pos
        parts: list[str] = []

        # comment start state
        if pos < n and s[pos] == ">":
            self._err("abrupt-closing-of-empty-comment", pos)
            self.pos = pos + 1
            self._emit((COMMENT, "", lt_pos, pos + 1))
            return
        if pos < n and s[pos] == "-" and pos + 1 < n and s[pos + 1] == ">":
            self._err("abrupt-closing-of-empty-comment", pos)
            self.pos = pos + 2
            self._emit((COMMENT, "", lt_pos, pos + 2))
            return

        while True:
            if pos >= n:
                self._err("eof-in-comment", pos)
                self.pos = n
                self._emit((COMMENT, "".join(parts), lt_pos, n + 1))
                self._eof()
                return
            c = s[pos]
            if c == "-":
                # count dash run
                dash_start = pos
                while pos < n and s[pos] == "-":
                    pos += 1
                dashes = pos - dash_start
                if pos >= n:
                    # EOF: the comment-end / comment-end-dash states drop the
                    # trailing dash run's last two (or lone) dashes
                    parts.append("-" * max(0, dashes - 2))
                    self._err("eof-in-comment", pos)
                    self.pos = n
                    self._emit((COMMENT, "".join(parts), lt_pos, n + 1))
                    self._eof()
                    return
                if dashes >= 2 and s[pos] == ">":
                    parts.append("-" * (dashes - 2))
                    self.pos = pos + 1
                    self._emit((COMMENT, "".join(parts), lt_pos, pos + 1))
                    return
                if dashes >= 2 and s[pos] == "!":
                    # comment end bang
                    if pos + 1 < n and s[pos + 1] == ">":
                        self._err("incorrectly-closed-comment", pos)
                        parts.append("-" * (dashes - 2))
                        self.pos = pos + 2
                        self._emit((COMMENT, "".join(parts), lt_pos, pos + 2))
                        return
                    if pos + 1 >= n:
                        # EOF in comment-end-bang: the "--!" is NOT appended
                        parts.append("-" * (dashes - 2))
                        self._err("eof-in-comment", n)
                        self.pos = n
                        self._emit((COMMENT, "".join(parts), lt_pos, n + 1))
                        self._eof()
                        return
                    parts.append("-" * (dashes - 2) + "--!")
                    pos += 1
                    continue
                parts.append("-" * dashes)
                continue
            if c == "\x00":
                self._err("unexpected-null-character", pos)
                parts.append("�")
                pos += 1
                continue
            if c == "<":
                # comment less-than-sign-bang-dash-dash: "<!--" inside a
                # comment followed by anything but ">" (or EOF) is the
                # nested-comment error, at the offending char (parse5
                # tokenizer/index.js:1921); the text is appended verbatim
                if (s.startswith("!--", pos + 1)
                        and pos + 4 < n and s[pos + 4] != ">"):
                    self._err("nested-comment", pos + 4)
                parts.append("<")
                pos += 1
                continue
            m = _COMMENT_RUN.match(s, pos)
            if m:
                parts.append(m.group())
                pos = m.end()

    # ---- DOCTYPE -----------------------------------------------------------

    def _doctype(self, lt_pos: int) -> None:
        s, n = self.html, self.n
        pos = self.pos
        name: str | None = None
        public_id: str | None = None
        system_id: str | None = None
        force_quirks = False

        def emit(endpos: int) -> None:
            self.pos = endpos
            self._emit((DOCTYPE, name, public_id, system_id, force_quirks, lt_pos, endpos))

        def emit_eof() -> None:
            # EOF-terminated doctype: parse5's endOffset counts the
            # consumed EOF pseudo-char (one past the input end)
            self.pos = n
            self._emit((DOCTYPE, name, public_id, system_id, force_quirks,
                        lt_pos, n + 1))

        if pos < n and s[pos] not in _WS and s[pos] != ">":
            self._err("missing-whitespace-before-doctype-name", pos)
        while pos < n and s[pos] in _WS:
            pos += 1
        if pos >= n:
            self._err("eof-in-doctype", pos)
            force_quirks = True
            emit_eof()
            self._eof()
            return
        if s[pos] == ">":
            self._err("missing-doctype-name", pos)
            force_quirks = True
            emit(pos + 1)
            return
        m = _DOCTYPE_NAME_RUN.match(s, pos)
        if m:
            raw = m.group()
            if "\x00" in raw:           # parse5: one error per NUL consumed
                i = raw.find("\x00")
                while i != -1:
                    self._err("unexpected-null-character", pos + i)
                    i = raw.find("\x00", i + 1)
            name = raw.lower().replace("\x00", "�")
            pos = m.end()
        else:
            name = ""

        # after doctype name
        while True:
            while pos < n and s[pos] in _WS:
                pos += 1
            if pos >= n:
                self._err("eof-in-doctype", pos)
                force_quirks = True
                emit_eof()
                self._eof()
                return
            if s[pos] == ">":
                emit(pos + 1)
                return
            kw = s[pos:pos + 6].lower()
            if kw == "public" and public_id is None and system_id is None:
                pos += 6
                pos, public_id, aborted = self._doctype_id(pos, "public")
                if aborted:
                    force_quirks = True
                    if pos >= n:
                        emit_eof()
                        self._eof()
                        return
                    if s[pos] == ">":
                        emit(pos + 1)
                        return
                    # bogus doctype
                    pos, hit_eof = self._skip_bogus_doctype(pos)
                    if hit_eof:
                        emit_eof()
                        self._eof()
                    else:
                        emit(pos)
                    return
                continue
            if kw == "system" and system_id is None:
                pos += 6
                pos, system_id, aborted = self._doctype_id(pos, "system")
                if aborted:
                    force_quirks = True
                    if pos >= n:
                        emit_eof()
                        self._eof()
                        return
                    if s[pos] == ">":
                        emit(pos + 1)
                        return
                    pos, hit_eof = self._skip_bogus_doctype(pos)
                    if hit_eof:
                        emit_eof()
                        self._eof()
                    else:
                        emit(pos)
                    return
                continue
            if public_id is not None and system_id is None and s[pos] in "\"'":
                # between public and system identifiers: quoted system id
                pos, system_id, aborted = self._doctype_quoted(pos)
                if aborted:
                    force_quirks = True
                    if pos >= n:
                        emit_eof()
                        self._eof()
                        return
                continue
            self._err("invalid-character-sequence-after-doctype-name", pos)
            # after a valid system id, bogus chars do NOT force quirks
            if system_id is None:
                force_quirks = True
            pos, hit_eof = self._skip_bogus_doctype(pos)
            if hit_eof:
                emit_eof()
                self._eof()
            else:
                emit(pos)
            return

    def _doctype_id(self, pos: int, kind: str) -> tuple[int, str | None, bool]:
        """After 'PUBLIC'/'SYSTEM' keyword. Returns (pos, id, aborted)."""
        s, n = self.html, self.n
        had_ws = False
        while pos < n and s[pos] in _WS:
            pos += 1
            had_ws = True
        if pos >= n:
            self._err("eof-in-doctype", pos)
            return n, None, True
        c = s[pos]
        if c in "\"'":
            if not had_ws:
                self._err(f"missing-whitespace-after-doctype-{kind}-keyword", pos)
            pos2, ident, aborted = self._doctype_quoted(pos)
            return pos2, ident, aborted
        if c == ">":
            self._err(f"missing-doctype-{kind}-identifier", pos)
            return pos, None, True
        self._err(f"missing-quote-before-doctype-{kind}-identifier", pos)
        return pos, None, True

    def _doctype_quoted(self, pos: int) -> tuple[int, str | None, bool]:
        s, n = self.html, self.n
        quote = s[pos]
        pos += 1
        end = s.find(quote, pos)
        gt = s.find(">", pos)
        if end == -1:
            if gt == -1:
                self._err("eof-in-doctype", n)
                ident = s[pos:].replace("\x00", "�")
                return n, ident, True
            self._err("abrupt-doctype-identifier", gt)
            ident = s[pos:gt].replace("\x00", "�")
            return gt, ident, True
        if gt != -1 and gt < end:
            self._err("abrupt-doctype-identifier", gt)
            ident = s[pos:gt].replace("\x00", "�")
            return gt, ident, True
        ident = s[pos:end].replace("\x00", "�")
        return end + 1, ident, False

    def _skip_bogus_doctype(self, pos: int) -> tuple[int, bool]:
        """Returns (next_pos, hit_eof) — the EOF case must emit end n+1."""
        s, n = self.html, self.n
        end = s.find(">", pos)
        if end == -1:
            return n, True
        return end + 1, False
