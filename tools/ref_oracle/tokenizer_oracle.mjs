// Tokenizer oracle: drives the reference's vendored parse5 Tokenizer with
// the same facade semantics as the reference's tokenize()
// (src/internal/tokenizer/tokenize.ts:139-259): first-wins attr dedup,
// adjacent Character merging, EOF append, initial-state override +
// lastStartTag arming, CDATA via inForeignNode.
//
// Usage: node tokenizer_oracle.mjs < cases.jsonl > golden.jsonl
//   in : {"id", "html", "initialState": "data"|..., "lastStartTag": ""}
//   out: {"id", "tokens": [...public token dicts...]}

import { createInterface } from "node:readline";
import { Tokenizer, TokenizerMode } from "/root/reference/src/internal/vendor/parse5/tokenizer/index.js";

const STATE_MAP = {
  data: TokenizerMode.DATA,
  rcdata: TokenizerMode.RCDATA,
  rawtext: TokenizerMode.RAWTEXT,
  script_data: TokenizerMode.SCRIPT_DATA,
  plaintext: TokenizerMode.PLAINTEXT,
  cdata: TokenizerMode.CDATA_SECTION
};

function tokenizeOnce(input, initialState, lastStartTag) {
  const tokens = [];
  const push = (t) => tokens.push(t);
  const tk = new Tokenizer({ sourceCodeLocationInfo: false }, {
    onStartTag(token) {
      const attrs = {};
      for (const attr of token.attrs) {
        if (attrs[attr.name] === undefined) attrs[attr.name] = attr.value;
      }
      push({ type: "StartTag", name: token.tagName, attributes: attrs,
             selfClosing: token.selfClosing });
    },
    onEndTag(token) { push({ type: "EndTag", name: token.tagName }); },
    onComment(token) { push({ type: "Comment", data: token.data }); },
    onDoctype(token) {
      push({ type: "Doctype", name: token.name ?? "",
             publicId: token.publicId ?? null,
             systemId: token.systemId ?? null,
             forceQuirks: token.forceQuirks });
    },
    onCharacter(t) { push({ type: "Character", data: t.chars }); },
    onWhitespaceCharacter(t) { push({ type: "Character", data: t.chars }); },
    onNullCharacter(t) { push({ type: "Character", data: t.chars }); },
    onParseError() {},
    onEof() {}
  });
  tk.state = STATE_MAP[initialState ?? "data"];
  tk.lastStartTagName = (lastStartTag ?? "").toLowerCase();
  if ((initialState ?? "data") === "cdata") tk.inForeignNode = true;
  tk.write(input, true);

  // merge adjacent Character tokens (tokenize.ts:68-85)
  const merged = [];
  for (const t of tokens) {
    const prev = merged[merged.length - 1];
    if (t.type === "Character" && prev?.type === "Character") {
      prev.data += t.data;
    } else {
      merged.push(t);
    }
  }
  merged.push({ type: "EOF" });
  return merged;
}

const rl = createInterface({ input: process.stdin });
for await (const line of rl) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  let out;
  try {
    out = { id: c.id,
            tokens: tokenizeOnce(c.html, c.initialState, c.lastStartTag) };
  } catch (err) {
    out = { id: c.id, error: String(err) };
  }
  process.stdout.write(JSON.stringify(out) + "\n");
}
