// Encoding-sniff oracle: drives the reference's sniffHtmlEncoding /
// decodeHtmlBytes (src/internal/encoding/sniff.ts). The source is
// TypeScript with no build output in this environment, so we strip the
// type syntax mechanically at load time (interfaces, annotations,
// generics — verified equivalent by line diff) and import the result as
// an ES module via a data: URL. Reference code never enters the repo.
//
// Usage: node encoding_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "bytes_b64", "transport": string|null, "max": int|null}
//   out: {"id", "encoding", "source", "text_sha256"}  (text only if decodable)

import { createInterface } from "node:readline";
import { readFileSync } from "node:fs";
import { createHash } from "node:crypto";

function stripTypes(src) {
  src = src.replace(/export interface \w+ \{[^}]*\}\n/g, "");
  src = src.replace(/\)\s*:\s*[^({;]+\{/g, ") {");
  src = src.replace(
    /(\w+)\s*:\s*(?:"[^"]*"(?:\s*\|\s*"[^"]*")+|[A-Za-z_][\w.]*(?:<[^>]+>)?(?:\[\])?(?:\s*\|\s*[A-Za-z_][\w.]*(?:\[\])?)*)(\s*[,)=])/g,
    "$1$2");
  src = src.replace(/new (Map|Set)<[^>]*>\(/g, "new $1(");
  src = src.replace(/let quote.*=\s*null;/, "let quote = null;");
  // repair object-literal returns the annotation strip mangled
  src = src.replace('return { encoding, source: "bom" };',
                    'return { encoding: bom, source: "bom" };');
  src = src.replace('return { encoding, source: "transport" };',
                    'return { encoding: transport, source: "transport" };');
  src = src.replace('return { encoding, source: "meta" };',
                    'return { encoding: prescan, source: "meta" };');
  src = src.replace('return { encoding, source: "default" };',
                    'return { encoding: defaultEncoding, source: "default" };');
  src = src.replace(
    /export function decodeHtmlBytes\(bytes, options = \{\}\) \{[^{]*\} \{/,
    "export function decodeHtmlBytes(bytes, options = {}) {");
  return src;
}

const ts = readFileSync(
  "/root/reference/src/internal/encoding/sniff.ts", "utf8");
const mod = await import(
  "data:text/javascript;base64," +
  Buffer.from(stripTypes(ts)).toString("base64"));

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  let out;
  try {
    const bytes = new Uint8Array(Buffer.from(c.bytes_b64, "base64"));
    const opts = {};
    if (c.transport) opts.transportEncodingLabel = c.transport;
    if (c.max) opts.maxPrescanBytes = c.max;
    const sniff = mod.sniffHtmlEncoding(bytes, opts);
    out = { id: c.id, encoding: sniff.encoding, source: sniff.source };
    try {
      const { text } = mod.decodeHtmlBytes(bytes, opts);
      out.text_sha256 = createHash("sha256").update(text, "utf8")
        .digest("hex");
    } catch { /* encoding not decodable by TextDecoder */ }
  } catch (err) {
    out = { id: c.id, error: String(err) };
  }
  process.stdout.write(JSON.stringify(out) + "\n");
}
