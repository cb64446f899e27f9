"""Boilerplate classification kernel + main-content stage tests.

Rules under test (htmlcore/boilerplate.py — jusText/boilerpipe-family
heuristics, no reference counterpart): block segmentation to the nearest
block ancestor, link-density threshold, chrome tag-path context, heading
promotion, short-block smoothing, invisible-subtree skip.
"""

import pyarrow as pa

from html_parser_ray.htmlcore.api import parse
from html_parser_ray.htmlcore.boilerplate import (classify_blocks,
                                                  main_content,
                                                  segment_blocks)


def _blocks(html, **kw):
    return classify_blocks(segment_blocks(parse(html)), **kw)


def test_segment_nearest_block_ancestor():
    html = "<div>outer <p>inner words</p> tail</div>"
    blocks = segment_blocks(parse(html))
    by_tag = {b.tag: b.text for b in blocks}
    assert by_tag["p"] == "inner words"
    assert by_tag["div"] == "outer tail"


def test_stray_body_text_gets_body_block():
    blocks = segment_blocks(parse("just some words"))
    assert [b.tag for b in blocks] == ["body"]
    assert blocks[0].text == "just some words"


def test_link_density_drops_menus():
    html = ("<div><a href=1>alpha</a> <a href=2>beta</a></div>"
            "<p>six plain words of real content</p>")
    blocks = _blocks(html)
    got = {b.tag: b.is_content for b in blocks}
    assert got == {"div": False, "p": True}


def test_chrome_context_drops_regardless_of_length():
    html = ("<nav><p>this navigation paragraph has plenty of words in it"
            "</p></nav><p>body paragraph with enough words here too</p>")
    blocks = _blocks(html)
    nav_p = [b for b in blocks if "nav" in b.path][0]
    body_p = [b for b in blocks if "nav" not in b.path and b.tag == "p"][0]
    assert not nav_p.is_content
    assert body_p.is_content


def test_heading_promotion_follows_next_block():
    good = ("<h2>Title</h2><p>a paragraph long enough to be content "
            "for sure</p>")
    bad = "<h2>Title</h2><div><a href=1>one</a> <a href=2>two</a></div>"
    assert [b.is_content for b in _blocks(good)] == [True, True]
    assert [b.is_content for b in _blocks(bad)] == [False, False]


def test_heading_chain_resolves_through_headings():
    html = ("<h1>Top</h1><h2>Sub</h2><p>the real paragraph with plenty "
            "of words follows the headings</p>")
    assert [b.is_content for b in _blocks(html)] == [True, True, True]


def test_short_block_smoothing_between_good_neighbours():
    html = ("<p>first long paragraph with definitely enough words</p>"
            "<p>Tiny.</p>"
            "<p>second long paragraph also with plenty of words here</p>")
    assert [b.is_content for b in _blocks(html)] == [True, True, True]


def test_short_block_not_promoted_at_edges():
    html = "<p>Tiny.</p><p>long paragraph with plenty of words right here</p>"
    assert [b.is_content for b in _blocks(html)] == [False, True]


def test_invisible_subtrees_skipped():
    html = ("<p>visible paragraph with enough words to be content</p>"
            "<div hidden>hidden words</div><script>var x=1;</script>"
            "<style>.a{}</style>")
    blocks = _blocks(html)
    assert [b.tag for b in blocks] == ["p"]


def test_main_content_end_to_end():
    html = ("<nav><a href=/>Home</a> <a href=/x>More</a></nav>"
            "<article><h1>Story</h1><p>the story body has plenty of words "
            "to qualify as content</p></article>"
            "<footer><p>copyright words</p></footer>")
    out = main_content(parse(html))
    assert out == ("Story\n\nthe story body has plenty of words to "
                   "qualify as content")


def test_main_content_stage_quarantines_and_counts(ray_session):
    import ray
    from html_parser_ray.stages.main_content import main_content_pages
    htmls = [
        b"<p>good page with plenty of words for the classifier</p>",
        b"<nav><a href=/>only nav links</a></nav>",
    ]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array(htmls, pa.binary()),
    }))
    rows = {r["url"]: r for r in main_content_pages(ds, concurrency=2,
                                                    batch_size=2).take_all()}
    assert rows["u1"]["status"] == "ok"
    assert rows["u1"]["n_content_blocks"] == 1
    assert rows["u1"]["main_text"].startswith("good page")
    assert rows["u2"]["main_text"] == ""
    assert rows["u2"]["n_content_blocks"] == 0
