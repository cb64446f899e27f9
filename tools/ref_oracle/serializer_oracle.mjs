// Serializer-fixture oracle: drives the reference's serializeFixtureTokenStream
// (src/internal/serializer/serialize.ts — the engine behind its html5lib
// serializer suites, scripts/conformance/run-serializer-fixtures.mjs) to
// produce golden outputs for authored html5lib-style serializer cases.
// The source is TypeScript with no build output in this environment, so the
// type syntax is stripped mechanically at load time (same approach as
// encoding_oracle.mjs) and imported via a data: URL. Reference code never
// enters the repo.
//
// Usage: node serializer_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id": "...", "input": [tokens...], "options": {...}|null}
//   out: {"id": "...", "expected": "serialized string"}

import { createInterface } from "node:readline";
import { readFileSync } from "node:fs";

// ---------------------------------------------------------------------------
// Minimal TS-annotation stripper, sufficient for serialize.ts's patterns:
// interface blocks, type aliases, param/return/variable annotations, casts.

function stripInterfacesAndAliases(src) {
  src = src.replace(/^import type .*\n/m, "");
  src = src.replace(/(?:export )?interface \w+ \{[^{}]*\}\n\n?/g, "");
  src = src.replace(/(?:export )?type \w+ =[^;]*;\n\n?/g, "");
  src = src.replace(/\b(const|let)\s+([\w$]+)\s*:\s*[\w$<>,[\]. |]+?=/g,
                    "$1 $2 =");
  src = src.replace(/ as (?:readonly )?[\w$]+(?:<[^<>]*>)?(?:\[\])?/g, "");
  return src;
}

// scan a type expression starting at src[i] (after the ':'); returns the end
// index (exclusive). Consumes identifiers, string literals, unions, generics,
// arrays, readonly, and ONE leading braced object type; stops at `,` / `)` /
// `=` at depth 0 (params) or at the body `{` after >=1 consumed token
// (return types).
function scanType(src, i, stopChars) {
  let depth = 0;
  let consumed = false;
  while (i < src.length) {
    const ch = src[i];
    if (ch === '"' || ch === "'") {
      const quote = ch;
      i += 1;
      while (i < src.length && src[i] !== quote) {
        if (src[i] === "\\") i += 1;
        i += 1;
      }
      i += 1;
      consumed = true;
      continue;
    }
    if (ch === "<" || ch === "[") { depth += 1; i += 1; continue; }
    if (ch === ">" || ch === "]") { depth -= 1; i += 1; continue; }
    if (ch === "{") {
      if (consumed) return i;            // body begins
      let braceDepth = 1;                // leading object type
      i += 1;
      while (i < src.length && braceDepth > 0) {
        if (src[i] === "{") braceDepth += 1;
        if (src[i] === "}") braceDepth -= 1;
        i += 1;
      }
      consumed = true;
      continue;
    }
    if (depth === 0 && stopChars.includes(ch)) return i;
    if (/[\w$|.&, \t\n?]/.test(ch)) {
      if (/[\w$]/.test(ch)) consumed = true;
      i += 1;
      continue;
    }
    return i;
  }
  return i;
}

function stripFunctionAnnotations(src) {
  let out = "";
  let i = 0;
  while (i < src.length) {
    const m = /^function\s+[\w$]*\s*\(/.exec(src.slice(i));
    if (!(src.startsWith("function", i) && m)) {
      out += src[i];
      i += 1;
      continue;
    }
    // copy "function name(" then rewrite the parameter list
    out += m[0];
    i += m[0].length;
    let depth = 1;
    while (i < src.length && depth > 0) {
      const ch = src[i];
      if (ch === "(") depth += 1;
      if (ch === ")") depth -= 1;
      if (depth === 0) break;
      if (ch === ":" && depth === 1) {
        i = scanType(src, i + 1, ",)=");
        continue;
      }
      if (ch === "?" && depth === 1 && src[i + 1] === ":") {
        i += 1;                          // optional param marker
        continue;
      }
      out += ch;
      i += 1;
    }
    out += ")";
    i += 1;
    // return type annotation
    let j = i;
    while (j < src.length && /\s/.test(src[j])) j += 1;
    if (src[j] === ":") {
      i = scanType(src, j + 1, "");
    }
  }
  return out;
}

function stripTypes(src) {
  return stripFunctionAnnotations(stripInterfacesAndAliases(src));
}

const ts = readFileSync(
  "/root/reference/src/internal/serializer/serialize.ts", "utf8");
const mod = await import(
  "data:text/javascript;base64," +
  Buffer.from(stripTypes(ts)).toString("base64"));

const rl = createInterface({ input: process.stdin, terminal: false });
rl.on("line", (line) => {
  if (!line.trim()) return;
  const c = JSON.parse(line);
  let result;
  try {
    result = {
      id: c.id,
      expected: mod.serializeFixtureTokenStream(c.input, c.options ?? {}),
    };
  } catch (err) {
    result = { id: c.id, error: String(err && err.message ? err.message : err) };
  }
  process.stdout.write(JSON.stringify(result) + "\n");
});
