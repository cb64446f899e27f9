// Golden-tree oracle: drives the reference's vendored parse5 (plain JS) to
// produce normalized `| `-indented tree dumps for arbitrary inputs, applying
// the same facade transformations as the reference's tree stage
// (select/option compat patch, namespace-prefixed names, attr dedup).
//
// Usage: node oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id": "...", "html": "...", "fragment": "body"|null, "scripting": true}
//   out: {"id": "...", "tree": "| <html>\n| ..."}

import { createInterface } from "node:readline";
import { Parser } from "/root/reference/src/internal/vendor/parse5/parser/index.js";

function parse(html, options) {
  return Parser.parse(html, options);
}

function parseFragment(context, html, options) {
  const parser = Parser.getFragmentParser(context, options);
  parser.tokenizer.write(html, true);
  return parser.getFragment();
}

const HTML_NS = "http://www.w3.org/1999/xhtml";
const SVG_NS = "http://www.w3.org/2000/svg";
const MATHML_NS = "http://www.w3.org/1998/Math/MathML";

const CONTEXT_DOCUMENT_HTML =
  "<!doctype html><html><head><title>x</title></head><body><table><tbody><tr><td></td></tr><caption></caption><colgroup></colgroup></table><frameset></frameset></body></html>";
const CONTEXT_DOCUMENT_FRAMESET =
  "<!doctype html><html><frameset></frameset></html>";

function formatElementName(ns, tagName) {
  if (ns === HTML_NS) return tagName;
  if (ns === SVG_NS) return `svg ${tagName}`;
  if (ns === MATHML_NS) return `math ${tagName}`;
  return `${ns} ${tagName}`;
}

function formatAttributeName(attr) {
  if (attr.prefix !== undefined && attr.prefix.length > 0 && attr.name.includes(":")) {
    return `${attr.prefix} ${attr.name.slice(attr.prefix.length + 1)}`;
  }
  return attr.name;
}

// mirror of the reference facade's patchSelectAdoptionCompatibility
// (src/internal/tree/build.ts:307-381)
function patchSelect(root) {
  const walk = (node) => {
    for (const child of node.childNodes ?? []) {
      if (child.childNodes) walk(child);
    }
    if (node.nodeName !== "body") return;
    for (let i = 0; i < node.childNodes.length - 1; i += 1) {
      const left = node.childNodes[i];
      const right = node.childNodes[i + 1];
      if (!left || !right) continue;
      if (left.nodeName !== "select" || right.nodeName !== "option") continue;
      if (left.attrs.length > 0 || right.attrs.length > 0) continue;
      const selectChild = left.childNodes[0];
      if (!selectChild || selectChild.nodeName !== "option") continue;
      if (left.childNodes.length !== 1 || selectChild.attrs.length > 0) continue;
      const lw = { nodeName: "b", tagName: "b", attrs: [], namespaceURI: left.namespaceURI, parentNode: left, childNodes: [selectChild] };
      selectChild.parentNode = lw;
      left.childNodes = [lw];
      const detached = right.childNodes.filter((c) => c.nodeName === "#text");
      right.childNodes = right.childNodes.filter((c) => c.nodeName !== "#text");
      const rw = { nodeName: "b", tagName: "b", attrs: [], namespaceURI: right.namespaceURI, parentNode: node, childNodes: [right] };
      right.parentNode = rw;
      node.childNodes[i + 1] = rw;
      if (detached.length > 0) {
        for (const t of detached) t.parentNode = node;
        node.childNodes.splice(i + 2, 0, ...detached);
      }
    }
  };
  walk(root);
}

function dumpNode(node, level, lines) {
  const indent = "  ".repeat(level);
  if (node.nodeName === "#text") {
    lines.push(`| ${indent}"${node.value}"`);
    return;
  }
  if (node.nodeName === "#comment") {
    lines.push(`| ${indent}<!-- ${node.data} -->`);
    return;
  }
  if (node.nodeName === "#documentType") {
    const pub = node.publicId ?? "";
    const sys = node.systemId ?? "";
    if (pub.length > 0 || sys.length > 0) {
      lines.push(`| ${indent}<!DOCTYPE ${node.name} "${pub}" "${sys}">`);
    } else {
      lines.push(`| ${indent}<!DOCTYPE ${node.name}>`);
    }
    return;
  }
  // element — dedupe attrs first-wins like the facade's normalizeAttributes
  lines.push(`| ${indent}<${formatElementName(node.namespaceURI, node.tagName)}>`);
  const seen = new Set();
  for (const attr of node.attrs ?? []) {
    const name = formatAttributeName(attr);
    if (seen.has(name)) continue;
    seen.add(name);
    lines.push(`| ${indent}  ${name}="${attr.value}"`);
  }
  for (const child of node.childNodes ?? []) {
    dumpNode(child, level + 1, lines);
  }
}

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
  if (t === "frameset") return findElement(parse(CONTEXT_DOCUMENT_FRAMESET), t);
  if (["html", "head", "body", "title"].includes(t)) {
    return findElement(parse(CONTEXT_DOCUMENT_HTML), t);
  }
  const frag = parseFragment(null, `<${t}></${t}>`);
  for (const child of frag.childNodes) {
    if (child.nodeName === t) return child;
  }
  return null;
}

const rl = createInterface({ input: process.stdin, terminal: false });
const out = [];
for await (const line of rl) {
  if (!line.trim()) continue;
  const req = JSON.parse(line);
  let result;
  try {
    const opts = { scriptingEnabled: req.scripting ?? true };
    let root;
    if (req.fragment !== undefined && req.fragment !== null) {
      root = parseFragment(fragmentContext(req.fragment), req.html, opts);
    } else {
      root = parse(req.html, opts);
    }
    patchSelect(root);
    const lines = [];
    for (const child of root.childNodes) dumpNode(child, 0, lines);
    result = { id: req.id, tree: lines.join("\n") };
  } catch (err) {
    result = { id: req.id, error: String(err && err.message || err) };
  }
  out.push(JSON.stringify(result));
}
process.stdout.write(out.join("\n") + "\n");
