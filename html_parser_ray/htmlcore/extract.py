"""Visible-text extraction + traversal/serialize/outline/chunk operators.

Byte-identical parity target: the reference's visibleText pipeline
(reference: src/public/mod.ts:986-1372 walker, :1130-1141 output
normalization, :1565-1667 token scanners, :1684-1795 traversal/outline,
:2179-2233 chunk, :938-984 serializer).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .dom import Element, Text, Comment, Doctype
from .api import ParseTree, parse_fragment, VOID_ELEMENTS

SKIP_TAGS = frozenset(["head", "script", "style", "template", "title",
                       "optgroup", "option"])
INPUT_VALUE_TYPES = frozenset(["button", "submit", "reset"])
BLOCK_BREAK_TAGS = frozenset([
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figcaption", "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5",
    "h6", "header", "li", "main", "nav", "ol", "section", "table", "tbody",
    "thead", "tfoot", "ul",
])

_CRLF = re.compile(r"\r\n")
_CR = re.compile(r"\r")
_WS_RUN = re.compile(r"[ \t\n\f\r]+")
_SP_BEFORE_NL = re.compile(r"[ \t\f]+\n")
_SP_AFTER_NL = re.compile(r"\n[ \t\f]+")
_NL3 = re.compile(r"\n{3,}")
_SP2 = re.compile(r"[ ]{2,}")
_TAB2 = re.compile(r"\t{2,}")
_STYLE_WS = re.compile(r"\s+")


@dataclass(frozen=True)
class VisibleTextOptions:
    skip_hidden_subtrees: bool = True
    include_control_values: bool = True
    include_accessible_name_fallback: bool = False
    trim: bool = True


DEFAULT_OPTIONS = VisibleTextOptions()


def _normalize_newlines(value: str) -> str:
    if "\r" not in value:
        return value
    return _CR.sub("\n", _CRLF.sub("\n", value))


def _collapse_ws(value: str) -> str:
    # cheap C-level prechecks: most segments have only single spaces, and
    # re.sub always rescans + reallocates even when nothing changes
    if ("\t" not in value and "\n" not in value and "\f" not in value
            and "\r" not in value and "  " not in value):
        return value
    return _WS_RUN.sub(" ", value)


def _normalize_segment(value: str, preserve: bool) -> str:
    normalized = _normalize_newlines(value)
    return normalized if preserve else _collapse_ws(normalized)


def normalize_visible_text_output(value: str, trim: bool = True) -> str:
    # each sub is a full-document regex pass + reallocation; a cheap
    # C-level substring precheck skips the passes that cannot match
    out = _normalize_newlines(value)
    if " \n" in out or "\t\n" in out or "\f\n" in out:
        out = _SP_BEFORE_NL.sub("\n", out)
    if "\n " in out or "\n\t" in out or "\n\f" in out:
        out = _SP_AFTER_NL.sub("\n", out)
    if "\n\n\n" in out:
        out = _NL3.sub("\n\n", out)
    if "  " in out:
        out = _SP2.sub(" ", out)
    if "\t\t" in out:
        out = _TAB2.sub("\t", out)
    if trim:
        out = out.strip()
    return out


def _attr(el: Element, name: str) -> str | None:
    target = name.lower()
    for aname, avalue in el.attrs:
        if aname.lower() == target:
            return avalue
    return None


def _bool_attr(value: str | None) -> bool:
    if value is None:
        return False
    normalized = value.strip().lower()
    return normalized in ("", "true", "1")


def _is_hidden(el: Element, options: VisibleTextOptions) -> bool:
    if not options.skip_hidden_subtrees:
        return False
    if _attr(el, "hidden") is not None:
        return True
    style = _attr(el, "style")
    if style:
        s = _STYLE_WS.sub("", style.lower())
        if ("display:none" in s or "visibility:hidden" in s
                or "content-visibility:hidden" in s):
            return True
    return _bool_attr(_attr(el, "aria-hidden"))


def _accessible_name_fallback(el: Element, options: VisibleTextOptions) -> str | None:
    if not options.include_accessible_name_fallback:
        return None
    if el.name.lower() != "input":
        return None
    type_value = (_attr(el, "type") or "text").strip().lower()
    if type_value == "hidden":
        return None
    value = _attr(el, "aria-label")
    if value is None:
        return None
    trimmed = value.strip()
    return trimmed if trimmed else None


# source chunk: (value, source_node, source_role)  — node None = document root
_DOC_SOURCE = (None, "text-node")

# tags whose _collect branch uses the emit closure — the common path (div,
# span, a, p, …) skips closure creation entirely
_EMIT_TAGS = frozenset(["img", "input", "button", "tr"])


def _collect(node, parts: list[str], options: VisibleTextOptions,
             preserve: bool, chunks: list | None,
             role_override: str | None) -> None:
    if type(node) is Text:
        value = _normalize_segment(node.value, preserve)
        if value:
            parts.append(value)
            if chunks is not None:
                chunks.append((value, node, role_override or "text-node"))
        return
    if type(node) is not Element:
        return
    if options.skip_hidden_subtrees and node.attrs and _is_hidden(node, options):
        return
    tag = node.name.lower()
    if tag in SKIP_TAGS:
        return

    # noscript raw-markup fallback (reference: collectNoscriptRawMarkup,
    # mod.ts:1201-1231)
    if tag == "noscript" and len(node.children) == 1:
        only = node.children[0]
        if isinstance(only, Text) and "<" in only.value and ">" in only.value:
            fallback = parse_fragment(only.value, "body")
            for child in fallback.children:
                _collect(child, parts, options, preserve, chunks,
                         "noscript-fallback")
            return

    if tag == "br":
        parts.append("\n")
        if chunks is not None:
            chunks.append(("\n", node, role_override or "structure-break"))
        return

    # emit() exists ONLY for tags in _EMIT_TAGS (img, input, button, tr) —
    # a new branch that calls emit() must also add its tag to _EMIT_TAGS,
    # or it raises NameError at runtime
    if tag in _EMIT_TAGS:   # only these branches need the emit closure
        if chunks is None:
            def emit(value: str, role: str, src=node) -> None:
                parts.append(value)
        else:
            def emit(value: str, role: str, src=node) -> None:
                if value:
                    parts.append(value)
                    chunks.append((value, src, role_override or role))

    if tag == "img" and options.include_control_values:
        alt = _attr(node, "alt")
        if alt:
            emit(_normalize_segment(alt, False), "img-alt")
        return
    if tag == "input" and options.include_control_values:
        type_value = (_attr(node, "type") or "text").lower()
        if type_value != "hidden":
            value = _attr(node, "value")
            if type_value in INPUT_VALUE_TYPES and value:
                emit(_normalize_segment(value, False), "input-value")
                return
            fallback_name = _accessible_name_fallback(node, options)
            if fallback_name:
                emit(_normalize_segment(fallback_name, False), "input-aria-label")
        return
    if tag == "select":
        return
    if tag == "button" and options.include_control_values:
        value = _attr(node, "value")
        if value:
            emit(_normalize_segment(value, False), "button-value")
            return
    if tag == "tr":
        emit("\n", "structure-break")
        seen_cell = False
        for child in node.children:
            if isinstance(child, Element) and child.name.lower() in ("td", "th"):
                if seen_cell:
                    emit("\t", "structure-break")
                _collect(child, parts, options, preserve, chunks, role_override)
                seen_cell = True
                continue
            _collect(child, parts, options, preserve, chunks, role_override)
        emit("\n", "structure-break")
        return
    if tag in ("td", "th"):
        for child in node.children:
            _collect(child, parts, options, preserve, chunks, role_override)
        return

    child_preserve = preserve or tag == "pre" or tag == "textarea"
    block_break = tag == "p" or tag in BLOCK_BREAK_TAGS
    if block_break:
        parts.append("\n")
        if chunks is not None:
            chunks.append(("\n", node, role_override or "structure-break"))
    for child in node.children:
        _collect(child, parts, options, child_preserve, chunks, role_override)
    if tag == "p":
        parts.append("\n\n")
        if chunks is not None:
            chunks.append(("\n\n", node, role_override or "structure-break"))
        return
    if block_break:
        parts.append("\n")
        if chunks is not None:
            chunks.append(("\n", node, role_override or "structure-break"))


def visible_text(tree: ParseTree | Element,
                 options: VisibleTextOptions = DEFAULT_OPTIONS) -> str:
    parts: list[str] = []
    if isinstance(tree, ParseTree):
        for child in tree.children:
            _collect(child, parts, options, False, None, None)
    else:
        _collect(tree, parts, options, False, None, None)
    return normalize_visible_text_output("".join(parts), options.trim)


def tokenize_visible_text(value: str) -> list[dict]:
    """Reference: tokenizeVisibleText mod.ts:1565-1610."""
    tokens: list[dict] = []
    n = len(value)
    cursor = 0
    text_start = -1
    while cursor < n:
        c = value[cursor]
        if c == "\n" or c == "\t":
            if text_start >= 0:
                tokens.append({"kind": "text", "value": value[text_start:cursor]})
                text_start = -1
            if c == "\n" and cursor + 1 < n and value[cursor + 1] == "\n":
                tokens.append({"kind": "paragraphBreak", "value": "\n\n"})
                cursor += 2
            elif c == "\n":
                tokens.append({"kind": "lineBreak", "value": "\n"})
                cursor += 1
            else:
                tokens.append({"kind": "tab", "value": "\t"})
                cursor += 1
            continue
        if text_start < 0:
            text_start = cursor
        cursor += 1
    if text_start >= 0:
        tokens.append({"kind": "text", "value": value[text_start:]})
    return tokens


def visible_text_tokens(tree: ParseTree | Element,
                        options: VisibleTextOptions = DEFAULT_OPTIONS) -> list[dict]:
    return tokenize_visible_text(visible_text(tree, options))


# ---------------------------------------------------------------------------
# provenance path (reference: mod.ts:1389-1667)

def _collect_with_chunks(tree: ParseTree, options: VisibleTextOptions):
    parts: list[str] = []
    chunks: list = []
    for child in tree.children:
        _collect(child, parts, options, False, chunks, None)
    return normalize_visible_text_output("".join(parts), options.trim), chunks


def _chunks_to_chars(chunks) -> list:
    chars = []
    for value, node, role in chunks:
        for ch in value:
            chars.append((ch, node, role))
    return chars


def _collapse_chars(chars, predicate, limit: int):
    result = []
    run = 0
    for entry in chars:
        if predicate(entry[0]):
            run += 1
            if run <= limit:
                result.append(entry)
            continue
        run = 0
        result.append(entry)
    return result


_PY_WS = re.compile(r"\s")


def _normalize_chars(chars, options: VisibleTextOptions):
    out = []
    for entry in chars:
        if entry[0] == "\n":
            while out and out[-1][0] in " \t\f":
                out.pop()
        out.append(entry)
    out2 = []
    for entry in out:
        if out2 and out2[-1][0] == "\n" and entry[0] in " \t\f":
            continue
        out2.append(entry)
    out3 = _collapse_chars(out2, lambda c: c == "\n", 2)
    out3 = _collapse_chars(out3, lambda c: c == " ", 1)
    out3 = _collapse_chars(out3, lambda c: c == "\t", 1)
    if not options.trim or not out3:
        return out3
    start, end = 0, len(out3)
    while start < end and _PY_WS.match(out3[start][0]):
        start += 1
    while end > start and _PY_WS.match(out3[end - 1][0]):
        end -= 1
    return out3[start:end]


def visible_text_tokens_with_provenance(
        tree: ParseTree,
        options: VisibleTextOptions = DEFAULT_OPTIONS) -> list[dict]:
    output, chunks = _collect_with_chunks(tree, options)
    chars = _normalize_chars(_chunks_to_chars(chunks), options)
    normalized = "".join(c[0] for c in chars)

    def meta(node, role) -> dict:
        if node is None:
            return {"sourceNodeId": None, "sourceNodeKind": "document",
                    "sourceRole": role}
        kind = "text" if isinstance(node, Text) else "element"
        return {"sourceNodeId": tree.ids.get(id(node)),
                "sourceNodeKind": kind, "sourceRole": role}

    if normalized != output:
        # char path disagrees with string path → unattributed fallback
        # (reference: mod.ts:1650-1664)
        out = []
        for token in tokenize_visible_text(output):
            role = "text-node" if token["kind"] == "text" else "structure-break"
            out.append({**token, "sourceNodeId": None,
                        "sourceNodeKind": "document", "sourceRole": role})
        return out

    tokens: list[dict] = []
    cursor = 0
    n = len(chars)
    while cursor < n:
        ch, node, role = chars[cursor]
        if ch == "\n" and cursor + 1 < n and chars[cursor + 1][0] == "\n":
            tokens.append({"kind": "paragraphBreak", "value": "\n\n", **meta(node, role)})
            cursor += 2
            continue
        if ch == "\n":
            tokens.append({"kind": "lineBreak", "value": "\n", **meta(node, role)})
            cursor += 1
            continue
        if ch == "\t":
            tokens.append({"kind": "tab", "value": "\t", **meta(node, role)})
            cursor += 1
            continue
        value = []
        src = (node, role)
        while cursor < n:
            ech, enode, erole = chars[cursor]
            if ech == "\n" or ech == "\t":
                break
            if enode is not src[0] or erole != src[1]:
                break
            value.append(ech)
            cursor += 1
        tokens.append({"kind": "text", "value": "".join(value), **meta(*src)})
    return tokens


# ---------------------------------------------------------------------------
# textContent / traversal / outline / chunk / serialize

def text_content(node) -> str:
    if isinstance(node, ParseTree):
        return "".join(text_content(c) for c in node.children)
    if isinstance(node, Text):
        return node.value
    if isinstance(node, Element):
        return "".join(text_content(c) for c in node.children)
    return ""


def walk(tree: ParseTree):
    """Yield (node, depth) in document order (reference: mod.ts:1669-1687)."""
    def it(nodes, depth):
        for node in nodes:
            yield node, depth
            if isinstance(node, Element):
                yield from it(node.children, depth + 1)
    yield from it(tree.children, 0)


def walk_elements(tree: ParseTree):
    for node, depth in walk(tree):
        if isinstance(node, Element):
            yield node, depth


def find_by_id(tree: ParseTree, node_id: int):
    return tree.by_id.get(node_id)


def find_all_by_tag_name(tree: ParseTree, tag_name: str):
    normalized = tag_name.lower()
    for node, _depth in walk(tree):
        if isinstance(node, Element) and node.name.lower() == normalized:
            yield node


def find_all_by_attr(tree: ParseTree, name: str, value: str | None = None):
    for node, _depth in walk(tree):
        if isinstance(node, Element):
            for aname, avalue in node.attrs:
                if aname == name and (value is None or avalue == value):
                    yield node
                    break


_HEADING_RE = re.compile(r"^h[1-6]$")


def outline(tree: ParseTree) -> list[dict]:
    """Reference: outline mod.ts:1758-1788."""
    entries: list[dict] = []

    def collect(node, depth: int) -> None:
        if not isinstance(node, Element):
            return
        normalized = node.name.lower()
        if _HEADING_RE.match(normalized) or normalized in ("section", "article"):
            entries.append({
                "nodeId": tree.ids[id(node)],
                "depth": depth,
                "tagName": node.name,
                "text": text_content(node)[:200],
            })
        for child in node.children:
            collect(child, depth + 1)

    for child in tree.children:
        collect(child, 0)
    return entries


def _escape_text(value: str) -> str:
    return value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attribute(value: str) -> str:
    return value.replace("&", "&amp;").replace('"', "&quot;")


def serialize_node(node) -> str:
    """Reference: serializeNode mod.ts:946-972 (public tagName form)."""
    if isinstance(node, Text):
        return _escape_text(node.value)
    if isinstance(node, Comment):
        return f"<!--{node.value}-->"
    if isinstance(node, Doctype):
        # public/system ids are dropped when empty (reference: convertTreeNode
        # mod.ts:418-419 keeps them only when non-empty)
        if node.public_id or node.system_id:
            return (f"<!DOCTYPE {node.name} \"{node.public_id or ''}\" "
                    f"\"{node.system_id or ''}\">")
        return f"<!DOCTYPE {node.name}>"
    attrs = " ".join(f'{n}="{_escape_attribute(v)}"' for n, v in node.attrs)
    open_tag = f"<{node.name} {attrs}>" if attrs else f"<{node.name}>"
    if node.name in VOID_ELEMENTS:
        return open_tag
    body = "".join(serialize_node(c) for c in node.children)
    return f"{open_tag}{body}</{node.name}>"


def serialize(tree) -> str:
    if isinstance(tree, ParseTree):
        return "".join(serialize_node(c) for c in tree.children)
    return serialize_node(tree)


def count_nodes(node) -> int:
    if not isinstance(node, Element):
        return 1
    return 1 + sum(count_nodes(c) for c in node.children)


def chunk(tree: ParseTree, max_chars: int = 8192, max_nodes: int = 256,
          max_bytes: float = float("inf")) -> list[dict]:
    """Reference: chunk mod.ts:2179-2233."""
    chunks: list[dict] = []
    active_content = ""
    active_nodes = 0
    active_bytes = 0
    active_node_id: int | None = None
    index = 0

    def flush() -> None:
        nonlocal index, active_content, active_nodes, active_bytes, active_node_id
        if active_node_id is None:
            return
        chunks.append({"index": index, "nodeId": active_node_id,
                       "content": active_content, "nodes": active_nodes})
        index += 1
        active_content = ""
        active_nodes = 0
        active_bytes = 0
        active_node_id = None

    for node in tree.children:
        content = serialize_node(node)
        nodes = count_nodes(node)
        nbytes = len(content.encode("utf-8"))
        if active_node_id is not None and (
                len(active_content) + len(content) > max_chars
                or active_nodes + nodes > max_nodes
                or active_bytes + nbytes > max_bytes):
            flush()
        if active_node_id is None:
            active_node_id = tree.ids[id(node)]
        active_content += content
        active_nodes += nodes
        active_bytes += nbytes
    flush()
    return chunks
