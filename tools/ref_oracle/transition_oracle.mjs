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

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  const transitions = [];
  try {
    Parser.parse(c.html, {
      scriptingEnabled: c.scripting !== false,
      sourceCodeLocationInfo: true,
      onInsertionModeTransition: (t) => transitions.push(
        [t.fromMode, t.toMode, t.tokenType, t.tokenTagName,
         t.tokenStartOffset, t.tokenEndOffset]),
    });
    process.stdout.write(JSON.stringify({ id: c.id, transitions }) + "\n");
  } catch (err) {
    process.stdout.write(JSON.stringify({ id: c.id, error: String(err) }) + "\n");
  }
}
