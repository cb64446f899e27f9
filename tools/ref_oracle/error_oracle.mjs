// Parse-error oracle: drives the reference's vendored parse5 with an
// onParseError collector and dumps the raw error-code stream (with offsets)
// so the engine's ParseError emission (api.normalize_parse_error_id input)
// can be differential-checked.
//
// Usage: node error_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "html", "fragment": null|tag, "scripting": bool}
//   out: {"id", "errors": [[code, startOffset, endOffset], ...]}

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
  let out;
  try {
    const errors = [];
    const options = {
      scriptingEnabled: c.scripting !== false,
      sourceCodeLocationInfo: true,
      onParseError: (err) => {
        errors.push([err.code, err.startOffset, err.endOffset]);
      },
    };
    if (c.fragment) {
      parseFragment(fragmentContext(c.fragment), c.html, options);
    } else {
      Parser.parse(c.html, options);
    }
    out = { id: c.id, errors };
  } catch (err) {
    out = { id: c.id, error: String(err) };
  }
  process.stdout.write(JSON.stringify(out) + "\n");
}
