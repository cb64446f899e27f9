"""pdfcore kernel + PdfExtractStage tests (north-star PDF/layout parse).

The kernel is a from-scratch stdlib implementation for the digital-born
subset: lexical object scan, FlateDecode, content-stream tokenizer,
BT/ET text positioning (Td/TD/T*/TL/Tm, Tj/TJ/'/\") and reading-order
reconstruction.
"""

import zlib

import pyarrow as pa

from html_parser_ray.pdfcore import (extract_pdf_text, make_minimal_pdf,
                                     pdf_layout_blocks)


def test_roundtrip_single_line():
    assert extract_pdf_text(make_minimal_pdf("Hello PDF world")) == \
        "Hello PDF world"


def test_roundtrip_multiline_multipage_both_codecs():
    pages = [["Line one (with parens)", "Line two \\ backslash",
              "Ünïcödé ok"], ["Second page text"]]
    want = ("Line one (with parens)\nLine two \\ backslash\nÜnïcödé ok"
            "\n\nSecond page text")
    for compress in (True, False):
        assert extract_pdf_text(make_minimal_pdf(
            pages, compress=compress)) == want


def test_roundtrip_empty():
    assert extract_pdf_text(make_minimal_pdf("")) == ""


def test_compressed_payload_ending_in_eol_bytes():
    # find texts whose Flate output ends in \r or \n — stripping the
    # endstream EOL by byte value alone corrupts these (regression: 5/500
    # corpus docs failed before decompress-validated stripping)
    found = 0
    for i in range(500):
        text = f"probe text number {i} " * 3
        content = (b"BT\n/F1 12 Tf\n14 TL\n72 720 Td\n(" +
                   text.encode() + b") Tj\nET")
        if zlib.compress(content, 6)[-1:] in (b"\r", b"\n"):
            found += 1
            assert extract_pdf_text(make_minimal_pdf(text)) == text
    assert found > 0  # the probe corpus must actually hit the edge case


def test_layout_blocks_positions_and_order():
    blocks = pdf_layout_blocks(make_minimal_pdf([["top line", "next line"]]))
    assert [b[3] for b in blocks] == ["top line", "next line"]
    assert blocks[0][2] > blocks[1][2]          # y decreases down the page
    assert blocks[0][1] == blocks[1][1] == 72.0  # left margin


def test_tj_array_and_quote_operators():
    # hand-built content stream: TJ array with kerning numbers, ' operator
    content = (b"BT /F1 12 Tf 14 TL 72 720 Td "
               b"[(Hel) -20 (lo)] TJ (world) ' ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " +
           str(len(content)).encode() +
           b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "Hello\nworld"


def test_hex_strings_and_escapes():
    content = (b"BT 72 720 Td <48656C6C6F> Tj (\\110\\151\\n) Tj "
               b"(a\\(b\\)c) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " +
           str(len(content)).encode() +
           b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "HelloHi\na(b)c"


def test_reading_order_restored_from_tm():
    # runs emitted bottom-up / right-to-left in the stream; extraction
    # must re-sort into top-down, left-to-right reading order
    content = (b"BT 1 0 0 1 200 100 Tm (tail) Tj "
               b"1 0 0 1 72 700 Tm (head ) Tj "
               b"1 0 0 1 120 700 Tm (line) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " +
           str(len(content)).encode() +
           b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "head line\ntail"


def test_garbage_and_non_text_streams_skipped():
    assert extract_pdf_text(b"not a pdf at all") == ""
    # image-ish stream without BT is ignored
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Subtype /Image /Length 4 >>\n"
           b"stream\n\x00\x01\x02\x03\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == ""


def test_pdf_extract_stage(ray_session):
    import ray
    from html_parser_ray.stages.pdf_extract import pdf_extract_pages
    pdfs = [make_minimal_pdf("first doc text"),
            b"%PDF-1.4 truncated garbage",
            make_minimal_pdf([["a", "b"], ["c"]])]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "pdf": pa.array(pdfs, pa.binary()),
    }))
    rows = {r["doc_id"]: r
            for r in pdf_extract_pages(ds, concurrency=2,
                                       batch_size=2).take_all()}
    assert rows[1]["pdf_text"] == "first doc text"
    assert rows[1]["status"] == "ok"
    assert rows[2]["pdf_text"] == ""    # graceful empty, not error
    assert rows[3]["pdf_text"] == "a\nb\n\nc"
    assert rows[3]["n_runs"] == 3
