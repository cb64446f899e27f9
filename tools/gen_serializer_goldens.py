"""Author html5lib-style serializer cases (mirroring the reference's
core/options/whitespace/optionaltags/injectmeta suites,
scripts/conformance/run-serializer-fixtures.mjs:6-12 — the vendored
html5lib-tests submodule is empty in this sandbox) and generate golden
outputs by driving the REFERENCE's own serializeFixtureTokenStream via
tools/ref_oracle/serializer_oracle.mjs. Writes
tests/fixtures/serializer_goldens/cases.jsonl with
{"id", "input", "options", "expected"} per case.

Usage: python tools/gen_serializer_goldens.py
"""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "serializer_goldens",
                   "cases.jsonl")


def build_cases() -> list[dict]:
    cases: list[dict] = []

    def add(cid: str, input_toks: list, options: dict | None = None) -> None:
        cases.append({"id": cid, "input": input_toks,
                      "options": options or {}})

    # ---- core: text escaping, comments, doctypes ----------------------
    add("core/text-amp-lt-gt", [["Characters", "a & b < c > d"]])
    add("core/text-double-escape", [["Characters", "&amp; &lt;"]])
    add("core/comment", [["Comment", " a -- b "]])
    add("core/doctype-plain", [["Doctype", "html", "", ""]])
    add("core/doctype-public",
        [["Doctype", "html", "-//W3C//DTD HTML 4.01//EN", ""]])
    add("core/doctype-system",
        [["Doctype", "html", "", "about:legacy-compat"]])
    add("core/doctype-public-system",
        [["Doctype", "HTML", "-//W3C//DTD HTML 4.01//EN",
          "http://www.w3.org/TR/html4/strict.dtd"]])
    add("core/rawtext-script",
        [["StartTag", "script", {}], ["Characters", "a<b && c>d"],
         ["EndTag", "script"]])
    add("core/rawtext-style",
        [["StartTag", "style", {}], ["Characters", "p > a { x: \"&\" }"],
         ["EndTag", "style"]])
    add("core/rcdata-title-escaped-by-default",
        [["StartTag", "title", {}], ["Characters", "a<b"],
         ["EndTag", "title"]])
    add("core/void-br", [["EmptyTag", "br", {}]])
    add("core/empty-tag-non-void", [["EmptyTag", "x-foo", {}]])
    add("core/namespaced-start-tag",
        [["StartTag", "http://www.w3.org/2000/svg", "rect",
          [{"name": "width", "value": "5"}]]])
    add("core/attr-list-form",
        [["StartTag", "a", [{"name": "z", "value": "1"},
                            {"name": "b", "value": "2"}]]])

    # ---- core: attribute quoting / ordering ---------------------------
    add("core/attr-unquoted", [["StartTag", "a", {"x": "safe-value_1"}]])
    add("core/attr-empty", [["StartTag", "a", {"x": ""}]])
    add("core/attr-space", [["StartTag", "a", {"x": "a b"}]])
    add("core/attr-tab-newline", [["StartTag", "a", {"x": "a\tb\nc"}]])
    add("core/attr-equals", [["StartTag", "a", {"x": "a=b"}]])
    add("core/attr-gt", [["StartTag", "a", {"x": "a>b"}]])
    add("core/attr-lt-unquoted", [["StartTag", "a", {"x": "a<b"}]])
    add("core/attr-double-quote", [["StartTag", "a", {"x": 'say "hi"'}]])
    add("core/attr-single-quote", [["StartTag", "a", {"x": "it's"}]])
    add("core/attr-both-quotes", [["StartTag", "a", {"x": "\"a\" 'b'"}]])
    add("core/attr-amp", [["StartTag", "a", {"x": "a&b"}]])
    add("core/attr-sorted", [["StartTag", "a",
                              {"z": "1", "a": "2", "m": "3"}]])
    add("core/attr-backtick", [["StartTag", "a", {"x": "a`b"}]])

    # ---- options ------------------------------------------------------
    add("options/quote-attr-values",
        [["StartTag", "a", {"x": "v"}]], {"quote_attr_values": True})
    add("options/quote-char-single",
        [["StartTag", "a", {"x": "v"}]],
        {"quote_attr_values": True, "quote_char": "'"})
    add("options/quote-char-single-value-has-single",
        [["StartTag", "a", {"x": "it's"}]],
        {"quote_attr_values": True, "quote_char": "'"})
    add("options/bool-minimized-default",
        [["StartTag", "input", {"checked": "checked", "type": "text"}]])
    add("options/bool-not-minimized",
        [["StartTag", "input", {"checked": "checked"}]],
        {"minimize_boolean_attributes": False})
    add("options/bool-empty-value",
        [["StartTag", "input", {"disabled": ""}]])
    add("options/bool-mismatched-value",
        [["StartTag", "input", {"checked": "yes"}]])
    add("options/bool-non-bool-name-matching-value",
        [["StartTag", "a", {"foo": "foo"}]])
    add("options/trailing-solidus-void",
        [["EmptyTag", "img", {"src": "u"}]], {"use_trailing_solidus": True})
    add("options/trailing-solidus-non-void",
        [["EmptyTag", "x-a", {}]], {"use_trailing_solidus": True})
    add("options/no-trailing-solidus", [["EmptyTag", "img", {}]])
    add("options/escape-lt-in-attrs",
        [["StartTag", "a", {"x": "a<b"}]], {"escape_lt_in_attrs": True})
    add("options/escape-rcdata-script",
        [["StartTag", "script", {}], ["Characters", "a<b"],
         ["EndTag", "script"]], {"escape_rcdata": True})
    add("options/escape-rcdata-textarea",
        [["StartTag", "textarea", {}], ["Characters", "a<b"],
         ["EndTag", "textarea"]], {"escape_rcdata": True})
    add("options/escape-rcdata-title",
        [["StartTag", "title", {}], ["Characters", "a<b"],
         ["EndTag", "title"]], {"escape_rcdata": True})

    # ---- whitespace ---------------------------------------------------
    add("whitespace/strip-basic",
        [["Characters", "  a \t\n b  "]], {"strip_whitespace": True})
    add("whitespace/strip-off-by-default", [["Characters", "  a \n b "]])
    add("whitespace/strip-preserves-pre",
        [["StartTag", "pre", {}], ["Characters", "  a \n b "],
         ["EndTag", "pre"], ["Characters", "  c \n d "]],
        {"strip_whitespace": True})
    add("whitespace/strip-preserves-textarea",
        [["StartTag", "textarea", {}], ["Characters", " a\n b"],
         ["EndTag", "textarea"]], {"strip_whitespace": True})
    add("whitespace/strip-preserves-script",
        [["StartTag", "script", {}], ["Characters", " a\n b"],
         ["EndTag", "script"]], {"strip_whitespace": True})
    add("whitespace/strip-preserves-style",
        [["StartTag", "style", {}], ["Characters", " a\n b"],
         ["EndTag", "style"]], {"strip_whitespace": True})
    add("whitespace/strip-nested-in-pre",
        [["StartTag", "pre", {}], ["StartTag", "span", {}],
         ["Characters", " a \n b "], ["EndTag", "span"],
         ["EndTag", "pre"]], {"strip_whitespace": True})
    add("whitespace/formfeed-cr",
        [["Characters", "a\f\rb"]], {"strip_whitespace": True})

    # ---- optionaltags: start-tag omission -----------------------------
    add("optionaltags/html-start-omitted",
        [["StartTag", "html", {}], ["StartTag", "p", {}],
         ["Characters", "x"], ["EndTag", "p"], ["EndTag", "html"]])
    add("optionaltags/html-start-kept-with-attrs",
        [["StartTag", "html", {"lang": "en"}], ["Characters", "x"],
         ["EndTag", "html"]])
    add("optionaltags/html-start-kept-before-comment",
        [["StartTag", "html", {}], ["Comment", "c"], ["EndTag", "html"]])
    add("optionaltags/html-start-kept-before-space",
        [["StartTag", "html", {}], ["Characters", " x"],
         ["EndTag", "html"]])
    add("optionaltags/body-start-omitted",
        [["StartTag", "body", {}], ["Characters", "x"],
         ["EndTag", "body"]])
    add("optionaltags/body-start-kept-before-space",
        [["StartTag", "body", {}], ["Characters", " x"],
         ["EndTag", "body"]])
    add("optionaltags/head-start-omitted-before-element",
        [["StartTag", "head", {}], ["StartTag", "title", {}],
         ["Characters", "t"], ["EndTag", "title"], ["EndTag", "head"]])
    add("optionaltags/head-start-kept-before-text",
        [["StartTag", "head", {}], ["Characters", "x"],
         ["EndTag", "head"]])
    add("optionaltags/head-start-kept-before-comment",
        [["StartTag", "head", {}], ["Comment", "c"], ["EndTag", "head"]])
    add("optionaltags/head-empty",
        [["StartTag", "head", {}], ["EndTag", "head"]])
    add("optionaltags/colgroup-start-omitted-before-col",
        [["StartTag", "table", {}], ["StartTag", "colgroup", {}],
         ["EmptyTag", "col", {}], ["EndTag", "colgroup"],
         ["EndTag", "table"]])
    add("optionaltags/colgroup-start-kept-without-col",
        [["StartTag", "table", {}], ["StartTag", "colgroup", {}],
         ["EndTag", "colgroup"], ["EndTag", "table"]])
    add("optionaltags/tbody-start-omitted-before-tr",
        [["StartTag", "table", {}], ["StartTag", "tbody", {}],
         ["StartTag", "tr", {}], ["EndTag", "tr"], ["EndTag", "tbody"],
         ["EndTag", "table"]])
    add("optionaltags/tbody-start-kept-after-thead-end",
        [["StartTag", "table", {}], ["StartTag", "thead", {}],
         ["StartTag", "tr", {}], ["EndTag", "tr"], ["EndTag", "thead"],
         ["StartTag", "tbody", {}], ["StartTag", "tr", {}],
         ["EndTag", "tr"], ["EndTag", "tbody"], ["EndTag", "table"]])

    # ---- optionaltags: end-tag omission -------------------------------
    add("optionaltags/li-before-li",
        [["StartTag", "ul", {}], ["StartTag", "li", {}],
         ["Characters", "a"], ["EndTag", "li"], ["StartTag", "li", {}],
         ["Characters", "b"], ["EndTag", "li"], ["EndTag", "ul"]])
    add("optionaltags/li-before-characters",
        [["StartTag", "li", {}], ["Characters", "a"], ["EndTag", "li"],
         ["Characters", "after"]])
    add("optionaltags/dt-before-dd",
        [["StartTag", "dl", {}], ["StartTag", "dt", {}],
         ["Characters", "t"], ["EndTag", "dt"], ["StartTag", "dd", {}],
         ["Characters", "d"], ["EndTag", "dd"], ["EndTag", "dl"]])
    add("optionaltags/dt-at-end-kept",
        [["StartTag", "dt", {}], ["Characters", "t"], ["EndTag", "dt"]])
    add("optionaltags/dd-before-dt",
        [["StartTag", "dd", {}], ["Characters", "d"], ["EndTag", "dd"],
         ["StartTag", "dt", {}], ["Characters", "t"], ["EndTag", "dt"],
         ["Characters", "z"]])
    for follower in ["div", "p", "ul", "table", "h1", "blockquote",
                     "address", "article", "aside", "hr", "pre",
                     "section", "form"]:
        add(f"optionaltags/p-before-{follower}-start",
            [["StartTag", "p", {}], ["Characters", "a"], ["EndTag", "p"],
             ["StartTag", follower, {}], ["EndTag", follower]])
    for follower in ["span", "em", "b"]:
        add(f"optionaltags/p-kept-before-{follower}-start",
            [["StartTag", "p", {}], ["Characters", "a"], ["EndTag", "p"],
             ["StartTag", follower, {}], ["Characters", "b"],
             ["EndTag", follower]])
    for end_follower in ["a", "audio", "del", "ins", "map", "noscript",
                         "video"]:
        add(f"optionaltags/p-kept-before-{end_follower}-end",
            [["StartTag", end_follower, {}], ["StartTag", "p", {}],
             ["Characters", "a"], ["EndTag", "p"],
             ["EndTag", end_follower], ["Characters", "z"]])
    add("optionaltags/p-omitted-before-div-end",
        [["StartTag", "div", {}], ["StartTag", "p", {}],
         ["Characters", "a"], ["EndTag", "p"], ["EndTag", "div"],
         ["Characters", "z"]])
    add("optionaltags/p-at-end-omitted",
        [["StartTag", "p", {}], ["Characters", "a"], ["EndTag", "p"]])
    add("optionaltags/p-kept-before-characters",
        [["StartTag", "p", {}], ["Characters", "a"], ["EndTag", "p"],
         ["Characters", "b"]])
    add("optionaltags/rt-before-rp",
        [["StartTag", "ruby", {}], ["Characters", "r"],
         ["StartTag", "rt", {}], ["Characters", "t"], ["EndTag", "rt"],
         ["StartTag", "rp", {}], ["Characters", "p"], ["EndTag", "rp"],
         ["EndTag", "ruby"]])
    add("optionaltags/option-before-option",
        [["StartTag", "select", {}], ["StartTag", "option", {}],
         ["Characters", "a"], ["EndTag", "option"],
         ["StartTag", "option", {}], ["Characters", "b"],
         ["EndTag", "option"], ["EndTag", "select"]])
    add("optionaltags/option-before-optgroup",
        [["StartTag", "option", {}], ["Characters", "a"],
         ["EndTag", "option"], ["StartTag", "optgroup", {}],
         ["StartTag", "option", {}], ["Characters", "b"],
         ["EndTag", "option"], ["EndTag", "optgroup"]])
    add("optionaltags/optgroup-before-optgroup",
        [["StartTag", "optgroup", {}], ["StartTag", "option", {}],
         ["Characters", "a"], ["EndTag", "option"],
         ["EndTag", "optgroup"], ["StartTag", "optgroup", {}],
         ["StartTag", "option", {}], ["Characters", "b"],
         ["EndTag", "option"], ["EndTag", "optgroup"]])
    add("optionaltags/colgroup-end-omitted-at-stream-end",
        [["StartTag", "colgroup", {}], ["EmptyTag", "col", {}],
         ["EndTag", "colgroup"]])
    add("optionaltags/colgroup-end-kept-before-space",
        [["StartTag", "colgroup", {}], ["EmptyTag", "col", {}],
         ["EndTag", "colgroup"], ["Characters", " x"]])
    add("optionaltags/thead-before-tbody",
        [["StartTag", "table", {}], ["StartTag", "thead", {}],
         ["StartTag", "tr", {}], ["EndTag", "tr"], ["EndTag", "thead"],
         ["StartTag", "tbody", {}], ["StartTag", "tr", {}],
         ["EndTag", "tr"], ["EndTag", "tbody"], ["EndTag", "table"]])
    add("optionaltags/tfoot-before-table-end",
        [["StartTag", "table", {}], ["StartTag", "tfoot", {}],
         ["StartTag", "tr", {}], ["EndTag", "tr"], ["EndTag", "tfoot"],
         ["EndTag", "table"]])
    add("optionaltags/tr-before-tr",
        [["StartTag", "table", {}], ["StartTag", "tr", {}],
         ["StartTag", "td", {}], ["Characters", "a"], ["EndTag", "td"],
         ["EndTag", "tr"], ["StartTag", "tr", {}],
         ["StartTag", "td", {}], ["Characters", "b"], ["EndTag", "td"],
         ["EndTag", "tr"], ["EndTag", "table"]])
    add("optionaltags/td-before-th",
        [["StartTag", "tr", {}], ["StartTag", "td", {}],
         ["Characters", "a"], ["EndTag", "td"], ["StartTag", "th", {}],
         ["Characters", "b"], ["EndTag", "th"], ["EndTag", "tr"]])
    add("optionaltags/td-kept-before-characters",
        [["StartTag", "td", {}], ["Characters", "a"], ["EndTag", "td"],
         ["Characters", "z"]])
    add("optionaltags/full-document",
        [["Doctype", "html", "", ""], ["StartTag", "html", {}],
         ["StartTag", "head", {}], ["StartTag", "title", {}],
         ["Characters", "t"], ["EndTag", "title"], ["EndTag", "head"],
         ["StartTag", "body", {}], ["StartTag", "p", {}],
         ["Characters", "x"], ["EndTag", "p"], ["EndTag", "body"],
         ["EndTag", "html"]])

    # ---- injectmeta ---------------------------------------------------
    im = {"inject_meta_charset": True, "encoding": "utf-8"}
    add("injectmeta/insert-into-empty-head",
        [["StartTag", "head", {}], ["EndTag", "head"]], im)
    add("injectmeta/update-existing-charset",
        [["StartTag", "head", {}],
         ["EmptyTag", "meta", [{"name": "charset", "value": "latin-1"}]],
         ["EndTag", "head"]], im)
    add("injectmeta/update-http-equiv",
        [["StartTag", "head", {}],
         ["EmptyTag", "meta",
          [{"name": "http-equiv", "value": "Content-Type"},
           {"name": "content",
            "value": "text/html; charset=latin-1"}]],
         ["EndTag", "head"]], im)
    add("injectmeta/meta-without-charset-gets-insert",
        [["StartTag", "head", {}],
         ["EmptyTag", "meta", [{"name": "name", "value": "viewport"}]],
         ["EndTag", "head"]], im)
    add("injectmeta/insert-before-title",
        [["StartTag", "head", {}], ["StartTag", "title", {}],
         ["Characters", "t"], ["EndTag", "title"], ["EndTag", "head"]],
        im)
    add("injectmeta/no-head-no-injection",
        [["StartTag", "p", {}], ["Characters", "x"], ["EndTag", "p"]], im)
    add("injectmeta/encoding-missing-no-injection",
        [["StartTag", "head", {}], ["EndTag", "head"]],
        {"inject_meta_charset": True})
    add("injectmeta/charset-meta-start-tag-form",
        [["StartTag", "head", {}],
         ["StartTag", "meta", [{"name": "charset", "value": "latin-1"}]],
         ["EndTag", "head"]], im)
    add("injectmeta/different-encoding",
        [["StartTag", "head", {}], ["EndTag", "head"]],
        {"inject_meta_charset": True, "encoding": "windows-1252"})

    return cases


def main() -> None:
    cases = build_cases()
    ids = [c["id"] for c in cases]
    assert len(ids) == len(set(ids)), "duplicate case ids"
    proc = subprocess.run(
        ["node", os.path.join(REPO, "tools", "ref_oracle",
                              "serializer_oracle.mjs")],
        input="\n".join(json.dumps(c) for c in cases),
        capture_output=True, text=True, timeout=300, check=True)
    golden = {g["id"]: g for g in
              (json.loads(line) for line in proc.stdout.splitlines())}
    errors = [g for g in golden.values() if "error" in g]
    if errors:
        raise SystemExit(f"oracle errors: {errors[:3]}")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps({**c,
                                "expected": golden[c["id"]]["expected"]})
                    + "\n")
    print(f"wrote {len(cases)} serializer golden cases to {OUT}")


if __name__ == "__main__":
    main()
