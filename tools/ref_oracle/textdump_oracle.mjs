// Independent visible-text quality oracle: a lynx/w3m-style text DUMP over
// the reference's vendored parse5 tree, mirroring the reference's
// third-party-renderer compare (scripts/dev/visible-text-oracle-compare.mjs
// runs `lynx -dump` / `w3m -dump` and scores token-F1 — those binaries are
// not installable in this sandbox, so this script stands in for them).
//
// The EXTRACTION rules below are written independently, text-browser-style
// (render everything a text browser renders), NOT copied from either the
// reference's visibleText or this repo's extract.py — deliberate semantic
// differences (lynx renders `hidden` subtrees and noscript fallbacks,
// skips form-control values) are what makes the token-F1 comparison an
// independent signal rather than a self-test.
//
// Usage: node textdump_oracle.mjs < cases.jsonl > dumps.jsonl
//   in : {"id": "...", "html": "<decoded html string>"}
//   out: {"id": "...", "dump": "text..."}

import { createInterface } from "node:readline";
import { Parser } from "/root/reference/src/internal/vendor/parse5/parser/index.js";

const SKIP_TAGS = new Set([
  "script", "style", "template", "head", "title", "textarea",
  "iframe", "object", "embed", "audio", "video", "svg", "math",
]);

// elements a text browser renders on their own line(s)
const BLOCK_TAGS = new Set([
  "p", "div", "section", "article", "aside", "header", "footer", "nav",
  "main", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "dl",
  "dt", "dd", "table", "caption", "tr", "blockquote", "pre", "address",
  "figure", "figcaption", "form", "fieldset", "legend", "details",
  "summary", "hr", "center", "dir", "menu",
]);

function attr(node, name) {
  for (const a of node.attrs ?? []) {
    if (a.name === name) return a.value;
  }
  return null;
}

function dumpNode(node, out, preserve) {
  if (node.nodeName === "#text") {
    out.push(preserve ? node.value : node.value.replace(/[\t\n\r\f ]+/g, " "));
    return;
  }
  if (node.nodeName === "#comment" || node.nodeName === "#documentType") {
    return;
  }
  const tag = node.tagName ? node.tagName.toLowerCase() : null;
  if (tag !== null && SKIP_TAGS.has(tag)) return;
  const block = tag !== null && BLOCK_TAGS.has(tag);
  if (block) out.push("\n");
  if (tag === "br") out.push("\n");
  if (tag === "img") {
    const alt = attr(node, "alt");
    if (alt) out.push(` ${alt} `);
  }
  if (tag === "td" || tag === "th") out.push(" ");
  const childPreserve = preserve || tag === "pre";
  for (const child of node.childNodes ?? []) {
    dumpNode(child, out, childPreserve);
  }
  if (block) out.push("\n");
}

function dump(html) {
  const doc = Parser.parse(html, { scriptingEnabled: true });
  const out = [];
  dumpNode(doc, out, false);
  return out
    .join("")
    .split("\n")
    .map((line) => line.replace(/[\t ]+/g, " ").trim())
    .filter((line) => line.length > 0)
    .join("\n");
}

const rl = createInterface({ input: process.stdin, terminal: false });
rl.on("line", (line) => {
  if (!line.trim()) return;
  const c = JSON.parse(line);
  let result;
  try {
    result = { id: c.id, dump: dump(c.html) };
  } catch (err) {
    result = { id: c.id, error: String(err && err.message ? err.message : err) };
  }
  process.stdout.write(JSON.stringify(result) + "\n");
});
