"""html5lib serializer-fixture semantics: serialize a token stream with the
serializer options the html5lib test suite exercises.

Behavior parity with the reference's fixture serializer (reference:
serializeFixtureTokenStream src/internal/serializer/serialize.ts:816-877;
option normalization :376-391; attr serialization :618-664; optional-tag
omission rules :403-592; inject-meta-charset :666-763). Conformance-harness
operator only (SURVEY.md §2.1 S7) — used from pytest, never as a Dataset op.

Input tokens use the html5lib fixture list shapes, e.g.
  ["StartTag", "p", {"class": "x"}]        (or with a namespace first)
  ["EmptyTag", "br", {}]
  ["EndTag", "p"]
  ["Characters", "text"]
  ["Comment", "c"]
  ["Doctype", "html", publicId, systemId]
"""

from __future__ import annotations

import re

VOID_ELEMENTS = frozenset([
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
])

BOOLEAN_ATTRIBUTES = frozenset([
    "allowfullscreen", "async", "autofocus", "autoplay", "checked",
    "controls", "default", "defer", "disabled", "formnovalidate", "hidden",
    "inert", "ismap", "itemscope", "loop", "multiple", "muted", "nomodule",
    "novalidate", "open", "playsinline", "readonly", "required", "reversed",
    "selected",
])

_OMITTABLE_START = frozenset(["html", "head", "body", "colgroup", "tbody"])
_P_END_KEEP_BEFORE_END = frozenset(
    ["a", "audio", "del", "ins", "map", "noscript", "video"])
_P_END_OMIT_BEFORE_START = frozenset([
    "address", "article", "aside", "blockquote", "details", "datagrid",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hgroup", "hr", "main", "menu", "nav", "ol", "p", "pre", "search",
    "section", "table", "ul",
])

_RAWTEXT_PARENTS = frozenset(["script", "style"])
_PRESERVE_WS_PARENTS = frozenset(["pre", "textarea", "script", "style"])
_SPACE_RUN = re.compile(r"[\t\n\f\r ]+")
_NEEDS_QUOTE = re.compile(r"[\t\n\f\r \"'=>]")

DEFAULT_OPTIONS = {
    "quote_char": '"',
    "quote_attr_values": False,
    "minimize_boolean_attributes": True,
    "use_trailing_solidus": False,
    "escape_lt_in_attrs": False,
    "escape_rcdata": False,
    "strip_whitespace": False,
    "inject_meta_charset": False,
    "encoding": "",
}


def _escape_text(value: str) -> str:
    return (value.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


# ---------------------------------------------------------------------------
# fixture token normalization

def _norm_attrs(raw) -> list[tuple[str | None, str, str]]:
    """→ [(namespace, name, value)] preserving fixture order."""
    out: list[tuple[str | None, str, str]] = []
    if isinstance(raw, list):
        for item in raw:
            if not isinstance(item, dict):
                continue
            name = item.get("name", "")
            if not name:
                continue
            out.append((item.get("namespace"), name, item.get("value", "")))
        return out
    if isinstance(raw, dict):
        for key, value in raw.items():
            if isinstance(key, tuple):  # html5lib (namespace, name) keys
                ns, name = key
                out.append((ns, name, value))
            else:
                out.append((None, str(key), str(value)))
    return out


def _norm_token(entry) -> dict | None:
    if not isinstance(entry, list) or not entry or not isinstance(entry[0], str):
        return None
    ttype = entry[0]
    if ttype == "StartTag":
        # namespaced form: ["StartTag", namespace-url, name, attrs]
        if (len(entry) >= 3 and isinstance(entry[1], str)
                and isinstance(entry[2], str)
                and ("://" in entry[1] or entry[1].startswith(("http:", "https:")))):
            return {"type": "StartTag", "name": entry[2],
                    "attrs": _norm_attrs(entry[3] if len(entry) > 3 else {})}
        return {"type": "StartTag",
                "name": entry[1] if len(entry) > 1 else "",
                "attrs": _norm_attrs(entry[2] if len(entry) > 2 else {})}
    if ttype == "EmptyTag":
        return {"type": "EmptyTag",
                "name": entry[1] if len(entry) > 1 else "",
                "attrs": _norm_attrs(entry[2] if len(entry) > 2 else {})}
    if ttype == "EndTag":
        if len(entry) >= 3 and isinstance(entry[2], str):
            return {"type": "EndTag", "name": entry[2]}
        return {"type": "EndTag", "name": entry[1] if len(entry) > 1 else ""}
    if ttype == "Characters":
        return {"type": "Characters",
                "data": entry[1] if len(entry) > 1 else ""}
    if ttype == "Comment":
        return {"type": "Comment", "data": entry[1] if len(entry) > 1 else ""}
    if ttype == "Doctype":
        return {"type": "Doctype",
                "name": entry[1] if len(entry) > 1 else "html",
                "publicId": entry[2] if len(entry) > 2 and isinstance(entry[2], str) else "",
                "systemId": entry[3] if len(entry) > 3 and isinstance(entry[3], str) else ""}
    return None


# ---------------------------------------------------------------------------
# optional-tag omission (serialize.ts:403-592)

def _name_of(tok) -> str | None:
    if tok and tok["type"] in ("StartTag", "EmptyTag", "EndTag"):
        return tok["name"]
    return None


def _starts_with_space(tok) -> bool:
    return (tok is not None and tok["type"] == "Characters"
            and bool(tok["data"]) and tok["data"][0] in "\t\n\f\r ")


def _omit_start_tag(tok, nxt, prev) -> bool:
    name = tok["name"]
    if name not in _OMITTABLE_START or tok["attrs"]:
        return False
    if name in ("html", "body"):
        if nxt is None:
            return True
        if nxt["type"] == "Comment" or _starts_with_space(nxt):
            return False
        return True
    if name == "head":
        if nxt is None:
            return False
        if nxt["type"] in ("Comment", "Characters"):
            return False
        if nxt["type"] == "EndTag" and nxt["name"] != "head":
            return False
        return True
    if name == "colgroup":
        return _name_of(nxt) == "col"
    if name == "tbody":
        if _name_of(nxt) != "tr":
            return False
        if (prev is not None and prev["type"] == "EndTag"
                and prev["name"] in ("tbody", "thead", "tfoot")):
            return False
        return True
    return False


def _omit_end_tag(tok, nxt) -> bool:
    name = tok["name"]
    nxt_name = _name_of(nxt)
    nxt_is_end = nxt is not None and nxt["type"] == "EndTag"

    if name in ("html", "head", "body"):
        if nxt is None:
            return True
        if nxt["type"] == "Comment" or _starts_with_space(nxt):
            return False
        return True
    if name == "li":
        return (nxt_name in ("li", "ul", "ol", "menu") or nxt_is_end
                or nxt is None)
    if name == "dt":
        return nxt_name in ("dt", "dd", "dl")
    if name == "dd":
        return (nxt_name in ("dt", "dd", "dl") or nxt_is_end or nxt is None)
    if name == "p":
        if nxt is None:
            return True
        if nxt["type"] in ("StartTag", "EmptyTag"):
            return nxt["name"] in _P_END_OMIT_BEFORE_START
        if nxt["type"] == "EndTag":
            return nxt["name"] not in _P_END_KEEP_BEFORE_END
        return False
    if name in ("rt", "rp"):
        return nxt_name in ("rt", "rp", "ruby") or nxt is None
    if name == "option":
        return (nxt_name in ("option", "optgroup", "select", "datalist")
                or nxt_is_end or nxt is None)
    if name == "optgroup":
        return nxt_name in ("optgroup", "select") or nxt_is_end or nxt is None
    if name == "colgroup":
        if nxt is None:
            return True
        if nxt["type"] == "Comment" or _starts_with_space(nxt):
            return False
        return nxt_name not in ("col", "colgroup")
    if name == "thead":
        return nxt_name in ("tbody", "tfoot", "table")
    if name == "tbody":
        return (nxt_name in ("tbody", "tfoot", "table") or nxt_is_end
                or nxt is None)
    if name == "tfoot":
        return nxt_name in ("tbody", "table") or nxt_is_end or nxt is None
    if name == "tr":
        return (nxt_name in ("tr", "tbody", "thead", "tfoot", "table")
                or nxt_is_end or nxt is None)
    if name in ("td", "th"):
        return (nxt_name in ("td", "th", "tr", "tbody", "thead", "tfoot",
                             "table") or nxt_is_end or nxt is None)
    return False


# ---------------------------------------------------------------------------
# attribute serialization (serialize.ts:595-664)

def _escape_attr(value: str, quote_char: str, escape_lt: bool) -> str:
    out = value.replace("&", "&amp;")
    if escape_lt:
        out = out.replace("<", "&lt;")
    if quote_char == '"':
        return out.replace('"', "&quot;")
    return out.replace("'", "&#39;")


def _serialize_attrs(attrs, opts) -> str:
    if not attrs:
        return ""
    parts: list[str] = []
    for ns, name, value in sorted(attrs, key=lambda a: a[1]):
        is_boolean = (ns is None
                      and (name.lower() in BOOLEAN_ATTRIBUTES
                           or value.lower() == name.lower())
                      and value.lower() == name.lower())
        if is_boolean and opts["minimize_boolean_attributes"]:
            parts.append(name)
            continue
        force_quote = (opts["quote_attr_values"]
                       or not value or _NEEDS_QUOTE.search(value)
                       or (opts["escape_lt_in_attrs"] and "<" in value))
        if not force_quote:
            parts.append(f'{name}='
                         f'{_escape_attr(value, opts["quote_char"], opts["escape_lt_in_attrs"])}')
            continue
        quote = opts["quote_char"]
        if not opts["quote_attr_values"] and opts["quote_char"] == '"':
            if '"' in value and "'" not in value:
                quote = "'"
            elif "'" in value and '"' not in value:
                quote = '"'
        escaped = _escape_attr(value, quote, opts["escape_lt_in_attrs"])
        parts.append(f"{name}={quote}{escaped}{quote}")
    return " " + " ".join(parts) if parts else ""


# ---------------------------------------------------------------------------
# inject-meta-charset (serialize.ts:666-763)

def _update_meta_encoding(tok, encoding: str) -> bool:
    if tok["name"] != "meta":
        return False
    touched = False
    new_attrs = []
    http_equiv = ""
    for ns, name, value in tok["attrs"]:
        if name.lower() == "charset":
            value = encoding
            touched = True
        if name.lower() == "http-equiv":
            http_equiv = value.lower()
        new_attrs.append((ns, name, value))
    if http_equiv == "content-type":
        for i, (ns, name, value) in enumerate(new_attrs):
            if name.lower() == "content":
                updated = re.sub(
                    r"charset\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s;]+)",
                    f"charset={encoding}", value, flags=re.IGNORECASE)
                if updated != value:
                    new_attrs[i] = (ns, name, updated)
                    touched = True
    tok["attrs"] = new_attrs
    return touched


def _inject_meta_charset(tokens: list[dict], opts) -> list[dict]:
    if not opts["inject_meta_charset"] or not opts["encoding"]:
        return tokens
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok["type"] == "StartTag" and tok["name"] == "head":
            depth = 1
            end = i + 1
            while end < len(tokens) and depth > 0:
                cur = tokens[end]
                if cur["type"] == "StartTag" and cur["name"] == "head":
                    depth += 1
                elif cur["type"] == "EndTag" and cur["name"] == "head":
                    depth -= 1
                end += 1
            head_end = max(i + 1, end - 1)
            has_charset = False
            for cursor in range(i + 1, head_end):
                cur = tokens[cursor]
                if cur["type"] in ("StartTag", "EmptyTag"):
                    if _update_meta_encoding(cur, opts["encoding"]):
                        has_charset = True
            if not has_charset:
                tokens.insert(i + 1, {
                    "type": "EmptyTag", "name": "meta",
                    "attrs": [(None, "charset", opts["encoding"])]})
                i += 1
        i += 1
    return tokens


# ---------------------------------------------------------------------------
# main entry

def serialize_fixture_token_stream(tokens: list, options: dict | None = None) -> str:
    opts = {**DEFAULT_OPTIONS, **(options or {})}
    parsed = [t for t in (_norm_token(e) for e in tokens) if t is not None]
    parsed = _inject_meta_charset(parsed, opts)

    chunks: list[str] = []
    open_stack: list[str] = []
    for i, tok in enumerate(parsed):
        nxt = parsed[i + 1] if i + 1 < len(parsed) else None
        prev = parsed[i - 1] if i > 0 else None

        if tok["type"] == "StartTag":
            if not _omit_start_tag(tok, nxt, prev):
                chunks.append(f'<{tok["name"]}'
                              f'{_serialize_attrs(tok["attrs"], opts)}>')
            open_stack.append(tok["name"])
        elif tok["type"] == "EmptyTag":
            attrs = _serialize_attrs(tok["attrs"], opts)
            if opts["use_trailing_solidus"] and tok["name"] in VOID_ELEMENTS:
                chunks.append(f'<{tok["name"]}{attrs} />')
            else:
                chunks.append(f'<{tok["name"]}{attrs}>')
        elif tok["type"] == "EndTag":
            if not _omit_end_tag(tok, nxt):
                chunks.append(f'</{tok["name"]}>')
            for j in range(len(open_stack) - 1, -1, -1):
                if open_stack[j] == tok["name"]:
                    del open_stack[j:]
                    break
        elif tok["type"] == "Characters":
            parent = open_stack[-1] if open_stack else None
            preserve = any(t in _PRESERVE_WS_PARENTS for t in open_stack)
            text = tok["data"]
            if opts["strip_whitespace"] and not preserve:
                text = _SPACE_RUN.sub(" ", text)
            if (parent in _RAWTEXT_PARENTS and not opts["escape_rcdata"]):
                chunks.append(text)
            else:
                chunks.append(_escape_text(text))
        elif tok["type"] == "Comment":
            chunks.append(f'<!--{tok["data"]}-->')
        else:  # Doctype
            name = tok["name"]
            pub, sys_id = tok["publicId"], tok["systemId"]
            if pub and sys_id:
                chunks.append(f'<!DOCTYPE {name} PUBLIC "{pub}" "{sys_id}">')
            elif pub:
                chunks.append(f'<!DOCTYPE {name} PUBLIC "{pub}">')
            elif sys_id:
                chunks.append(f'<!DOCTYPE {name} SYSTEM "{sys_id}">')
            else:
                chunks.append(f"<!DOCTYPE {name}>")
    return "".join(chunks)
