"""html5lib serializer-fixture semantics tests. Cases authored in the
html5lib serializer-suite style (the submodule with the real fixtures is
empty in this sandbox — SURVEY.md §5.2); behavior mirrors the reference's
serializeFixtureTokenStream (serialize.ts:816-877)."""

from html_parser_ray.htmlcore.fixture_serializer import (
    serialize_fixture_token_stream as ser,
)


def test_basic_roundtrip():
    toks = [["StartTag", "p", {"class": "x"}], ["Characters", "a<b"],
            ["EndTag", "p"]]
    # </p> is omittable at end of stream (serialize.ts:505-516)
    assert ser(toks) == '<p class=x>a&lt;b'
    toks.append(["Comment", "keep"])
    # a following Comment blocks the </p> omission
    assert ser(toks) == '<p class=x>a&lt;b</p><!--keep-->'


def test_attr_quoting_rules():
    # unquoted when safe; quote on ws / quotes / = / >; quote flip
    assert ser([["StartTag", "a", {"href": "u r l"}]]) == '<a href="u r l">'
    assert ser([["StartTag", "a", {"t": 'say "hi"'}]]) == "<a t='say \"hi\"'>"
    assert ser([["StartTag", "a", {"t": "it's"}]]) == '<a t="it\'s">'
    assert ser([["StartTag", "a", {"t": ""}]]) == '<a t="">'
    assert ser([["StartTag", "a", {"t": "v"}]],
               {"quote_attr_values": True}) == '<a t="v">'
    assert ser([["StartTag", "a", {"t": "v"}]],
               {"quote_char": "'", "quote_attr_values": True}) == "<a t='v'>"


def test_attrs_sorted_by_name():
    assert ser([["StartTag", "a", {"z": "1", "b": "2"}]]) == '<a b=2 z=1>'


def test_boolean_attr_minimization():
    toks = [["StartTag", "input", {"checked": "checked", "type": "text"}]]
    assert ser(toks) == '<input checked type=text>'
    assert ser(toks, {"minimize_boolean_attributes": False}) == \
        '<input checked=checked type=text>'


def test_escape_lt_in_attrs_option():
    toks = [["StartTag", "a", {"t": "a<b"}]]
    assert ser(toks) == '<a t=a<b>'
    assert ser(toks, {"escape_lt_in_attrs": True}) == '<a t="a&lt;b">'


def test_trailing_solidus_void_only():
    assert ser([["EmptyTag", "br", {}]],
               {"use_trailing_solidus": True}) == '<br />'
    assert ser([["EmptyTag", "br", {}]]) == '<br>'


def test_optional_start_tag_omission():
    toks = [["StartTag", "html", {}], ["StartTag", "head", {}],
            ["EndTag", "head"], ["StartTag", "body", {}],
            ["Characters", "x"], ["EndTag", "body"], ["EndTag", "html"]]
    assert ser(toks) == "x"
    # attrs force the tag to stay
    toks2 = [["StartTag", "html", {"lang": "en"}], ["Characters", "x"],
             ["EndTag", "html"]]
    assert ser(toks2) == '<html lang=en>x'


def test_li_and_p_end_tag_omission():
    toks = [["StartTag", "ul", {}],
            ["StartTag", "li", {}], ["Characters", "a"], ["EndTag", "li"],
            ["StartTag", "li", {}], ["Characters", "b"], ["EndTag", "li"],
            ["EndTag", "ul"]]
    assert ser(toks) == "<ul><li>a<li>b</ul>"
    toks = [["StartTag", "p", {}], ["Characters", "one"], ["EndTag", "p"],
            ["StartTag", "p", {}], ["Characters", "two"], ["EndTag", "p"]]
    assert ser(toks) == "<p>one<p>two"
    # </p> kept before <a>
    toks = [["StartTag", "p", {}], ["Characters", "x"], ["EndTag", "p"],
            ["StartTag", "a", {}], ["Characters", "l"], ["EndTag", "a"]]
    assert ser(toks) == "<p>x</p><a>l</a>"


def test_table_section_omission():
    toks = [["StartTag", "table", {}],
            ["StartTag", "tbody", {}],
            ["StartTag", "tr", {}], ["StartTag", "td", {}],
            ["Characters", "c"], ["EndTag", "td"], ["EndTag", "tr"],
            ["EndTag", "tbody"], ["EndTag", "table"]]
    assert ser(toks) == "<table><tr><td>c</table>"


def test_rawtext_not_escaped():
    toks = [["StartTag", "script", {}], ["Characters", "a < b && c"],
            ["EndTag", "script"]]
    assert ser(toks) == "<script>a < b && c</script>"
    assert ser(toks, {"escape_rcdata": True}) == \
        "<script>a &lt; b &amp;&amp; c</script>"


def test_strip_whitespace_preserves_pre():
    toks = [["StartTag", "p", {}], ["Characters", "a   b\n\nc"],
            ["EndTag", "p"]]
    assert ser(toks, {"strip_whitespace": True}) == "<p>a b c"
    toks = [["StartTag", "pre", {}], ["Characters", "a   b"],
            ["EndTag", "pre"]]
    assert ser(toks, {"strip_whitespace": True}) == "<pre>a   b</pre>"


def test_doctype_forms():
    assert ser([["Doctype", "html"]]) == "<!DOCTYPE html>"
    assert ser([["Doctype", "html", "pub", ""]]) == \
        '<!DOCTYPE html PUBLIC "pub">'
    assert ser([["Doctype", "html", "", "sys"]]) == \
        '<!DOCTYPE html SYSTEM "sys">'
    assert ser([["Doctype", "html", "pub", "sys"]]) == \
        '<!DOCTYPE html PUBLIC "pub" "sys">'


def test_inject_meta_charset_updates_existing():
    toks = [["StartTag", "head", {}],
            ["EmptyTag", "meta", {"charset": "ascii"}],
            ["EndTag", "head"]]
    out = ser(toks, {"inject_meta_charset": True, "encoding": "utf-8"})
    assert "charset=utf-8" in out and "ascii" not in out


def test_inject_meta_charset_inserts_when_absent():
    toks = [["StartTag", "head", {}], ["EndTag", "head"],
            ["StartTag", "body", {}], ["Characters", "x"], ["EndTag", "body"]]
    out = ser(toks, {"inject_meta_charset": True, "encoding": "utf-8"})
    # <head> itself is omittable once the injected meta follows it
    assert out == "<meta charset=utf-8>x"


def test_inject_meta_charset_rewrites_http_equiv_content():
    toks = [["StartTag", "head", {}],
            ["EmptyTag", "meta", {"http-equiv": "Content-Type",
                                  "content": "text/html; charset=ascii"}],
            ["EndTag", "head"]]
    out = ser(toks, {"inject_meta_charset": True, "encoding": "utf-8"})
    assert "charset=utf-8" in out


def test_namespaced_start_tag_form():
    toks = [["StartTag", "http://www.w3.org/2000/svg", "svg", {}],
            ["EndTag", "http://www.w3.org/2000/svg", "svg"]]
    assert ser(toks) == "<svg></svg>"


def test_comment_passthrough():
    assert ser([["Comment", " hi "]]) == "<!-- hi -->"
