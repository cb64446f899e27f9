// Insertion-mode-transition oracle: drives the vendored parser's
// onInsertionModeTransition instrumentation so the engine's trace
// events (htmlcore/trace.py TracingTreeBuilder) can be
// differential-checked. Record format mirrors the reference's public
// trace channel (src/public/mod.ts:505-527).
//
// Usage: node transition_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "html", "scripting": bool}
//   out: {"id", "transitions": [[from, to, tokenType, tagName, start, end]...]}

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

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  const transitions = [];
  try {
    const options = {
      scriptingEnabled: c.scripting !== false,
      sourceCodeLocationInfo: true,
      onInsertionModeTransition: (t) => transitions.push(
        [t.fromMode, t.toMode, t.tokenType, t.tokenTagName,
         t.tokenStartOffset, t.tokenEndOffset]),
    };
    if (c.fragment) {
      parseFragment(fragmentContext(c.fragment), c.html, options);
    } else {
      Parser.parse(c.html, options);
    }
    process.stdout.write(JSON.stringify({ id: c.id, transitions }) + "\n");
  } catch (err) {
    process.stdout.write(JSON.stringify({ id: c.id, error: String(err) }) + "\n");
  }
}
