// Span oracle: parse with parse5 sourceCodeLocationInfo and dump per-element
// (path, startOffset, endOffset, attr offsets) so our capture_spans output
// can be differential-checked (reference parity surface: captureSpans,
// src/public/mod.ts convertNode span attachment).
//
// Usage: node span_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "html"}
//   out: {"id", "spans": [[path, start, end], ...], "attrs": [[path, name, start, end], ...]}

// Fragment cases: pass {"fragment": "<tag>"} — the context element is
// built exactly like oracle.mjs / the reference's buildTreeFromHtml
// (parsed out of a context document / fragment, not a detached element —
// detached contexts change reset-insertion-mode behavior).

import { createInterface } from "node:readline";
import { Parser } from "/root/reference/src/internal/vendor/parse5/parser/index.js";

function parseFragment(context, html, options) {
  const parser = Parser.getFragmentParser(context, options);
  parser.tokenizer.write(html, true);
  return parser.getFragment();
}

const CONTEXT_DOCUMENT_HTML =
  "<!doctype html><html><head><title>x</title></head><body><table><tbody><tr><td></td></tr><caption></caption><colgroup></colgroup></table><frameset></frameset></body></html>";
const CONTEXT_DOCUMENT_FRAMESET =
  "<!doctype html><html><frameset></frameset></html>";

function findElement(node, tagName) {
  for (const child of node.childNodes ?? []) {
    if (child.nodeName === tagName) return child;
    if (child.childNodes) {
      const nested = findElement(child, tagName);
      if (nested) return nested;
    }
  }
  return null;
}

function fragmentContext(tagName) {
  const t = tagName.trim().toLowerCase();
  if (!t) return null;
  if (t === "frameset") {
    return findElement(Parser.parse(CONTEXT_DOCUMENT_FRAMESET), t);
  }
  if (["html", "head", "body", "title"].includes(t)) {
    return findElement(Parser.parse(CONTEXT_DOCUMENT_HTML), t);
  }
  const frag = parseFragment(null, `<${t}></${t}>`, {});
  for (const child of frag.childNodes) {
    if (child.nodeName === t) return child;
  }
  return null;
}

function collect(node, path, spans, attrs) {
  // parse5 templates hold their children on .content (a DocumentFragment),
  // not childNodes — descend so template-content spans are checked too
  const kids = node.content ? node.content.childNodes : (node.childNodes ?? []);
  let idx = 0;
  for (const child of kids) {
    const p = `${path}/${idx}`;
    if (child.tagName !== undefined) {
      const loc = child.sourceCodeLocation;
      if (loc) {
        spans.push([p, loc.startOffset, loc.endOffset ?? -1]);
        if (loc.attrs) {
          for (const [name, aloc] of Object.entries(loc.attrs)) {
            attrs.push([p, name, aloc.startOffset, aloc.endOffset]);
          }
        }
      } else {
        spans.push([p, -1, -1]);
      }
      collect(child, p, spans, attrs);
    } else if (child.nodeName === "#text" || child.nodeName === "#comment" ||
               child.nodeName === "#documentType") {
      const loc = child.sourceCodeLocation;
      spans.push([p, loc ? loc.startOffset : -1, loc ? loc.endOffset : -1]);
    }
    idx += 1;
  }
}

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  let out;
  try {
    let root;
    if (c.fragment) {
      root = parseFragment(
        fragmentContext(c.fragment), c.html,
        { sourceCodeLocationInfo: true, scriptingEnabled: true });
    } else {
      root = Parser.parse(c.html, { sourceCodeLocationInfo: true, scriptingEnabled: true });
    }
    const spans = [];
    const attrs = [];
    collect(root, "", spans, attrs);
    out = { id: c.id, spans, attrs };
  } catch (err) {
    out = { id: c.id, error: String(err) };
  }
  process.stdout.write(JSON.stringify(out) + "\n");
}
