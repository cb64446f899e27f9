// Span oracle: parse with parse5 sourceCodeLocationInfo and dump per-element
// (path, startOffset, endOffset, attr offsets) so our capture_spans output
// can be differential-checked (reference parity surface: captureSpans,
// src/public/mod.ts convertNode span attachment).
//
// Usage: node span_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "html"}
//   out: {"id", "spans": [[path, start, end], ...], "attrs": [[path, name, start, end], ...]}

import { createInterface } from "node:readline";
import { Parser } from "/root/reference/src/internal/vendor/parse5/parser/index.js";

function collect(node, path, spans, attrs) {
  const kids = node.childNodes ?? [];
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
    } else if (child.nodeName === "#text") {
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
    const doc = Parser.parse(c.html, { sourceCodeLocationInfo: true, scriptingEnabled: true });
    const spans = [];
    const attrs = [];
    collect(doc, "", spans, attrs);
    out = { id: c.id, spans, attrs };
  } catch (err) {
    out = { id: c.id, error: String(err) };
  }
  process.stdout.write(JSON.stringify(out) + "\n");
}
