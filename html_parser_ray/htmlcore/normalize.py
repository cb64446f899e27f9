"""Normalized `| `-indented tree dump — the conformance oracle format.

Same output shape as the reference's test normalizer
(reference: src/internal/tree/normalize.ts:11-52): element names carry the
namespace prefix form ("svg svg", "math mi"), attributes follow in tree
order, text/comment/doctype lines mirror the html5lib fixture style.
"""

from __future__ import annotations

from .dom import Element, Text, Comment, Doctype, HTML_NS, SVG_NS, MATHML_NS


def _element_name(el: Element) -> str:
    if el.ns == HTML_NS:
        return el.name
    if el.ns == SVG_NS:
        return f"svg {el.name}"
    if el.ns == MATHML_NS:
        return f"math {el.name}"
    return f"{el.ns} {el.name}"


def _dump(node, level: int, lines: list[str]) -> None:
    indent = "  " * level
    if isinstance(node, Element):
        lines.append(f"| {indent}<{_element_name(node)}>")
        for name, value in node.attrs:
            lines.append(f'| {indent}  {name}="{value}"')
        for child in node.children:
            _dump(child, level + 1, lines)
        return
    if isinstance(node, Text):
        lines.append(f'| {indent}"{node.value}"')
        return
    if isinstance(node, Comment):
        lines.append(f"| {indent}<!-- {node.value} -->")
        return
    if isinstance(node, Doctype):
        public_id = node.public_id or ""
        system_id = node.system_id or ""
        if public_id or system_id:
            lines.append(f'| {indent}<!DOCTYPE {node.name} "{public_id}" "{system_id}">')
        else:
            lines.append(f"| {indent}<!DOCTYPE {node.name}>")


def normalize_tree(tree) -> str:
    """``tree`` is a ParseTree or anything with ``.children``."""
    lines: list[str] = []
    for child in tree.children:
        _dump(child, 0, lines)
    return "\n".join(lines)
