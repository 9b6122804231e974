"""S2 (PDF) and S9 (HTML) real-extraction tests: the stdlib PDF parser
against programmatically-built valid PDFs, the stdlib HTML tree parser
against bs4 semantics, and both through their Spark read paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.sources import blocks
from etl_pipeline_project_auraverse_spark.sources.html_text import iter_tag_rows
from etl_pipeline_project_auraverse_spark.sources.pdf_text import extract_pdf_text
from tests.pdf_builder import build_pdf

# ---------------------------------------------------------------------------
# PDF: parser unit tests
# ---------------------------------------------------------------------------


def test_pdf_multipage_order_and_escapes():
    pdf = build_pdf(
        [
            ["Hello World", r"parens (nested) and \ backslash"],
            ["Page 2 here", "id,name", "1,alpha"],
        ]
    )
    text = extract_pdf_text(pdf)
    assert text.splitlines() == [
        "Hello World",
        "parens (nested) and \\ backslash",
        "Page 2 here",
        "id,name",
        "1,alpha",
    ]


def test_pdf_flate_compressed_stream():
    pdf = build_pdf([["Compressed content line", "second line"]], compress=True)
    assert extract_pdf_text(pdf) == "Compressed content line\nsecond line"


def test_pdf_tj_array_with_kerning_word_spaces():
    pdf = build_pdf(
        [["TJ array fragments go here", "second TJ line"]],
        compress=True,
        use_tj_array=True,
    )
    assert extract_pdf_text(pdf) == "TJ array fragments go here\nsecond TJ line"


def test_pdf_hex_strings_and_octal():
    # hand-rolled content stream exercising <hex> and \octal forms
    from tests.pdf_builder import build_pdf as _b

    pdf = _b([["placeholder"]])
    content = b"BT /F1 12 Tf 72 720 Td <48656C6C6F> Tj 0 -14 Td (\\101\\102\\103) Tj ET"
    pdf = pdf.replace(b"(placeholder) Tj", b"%s" % content[len(b"BT /F1 12 Tf 72 720 Td ") :], 1)
    text = extract_pdf_text(pdf)
    assert "Hello" in text and "ABC" in text


def test_pdf_not_a_pdf_and_empty():
    assert extract_pdf_text(b"plain text, not a pdf") == ""
    empty_pdf = build_pdf([[]])
    assert extract_pdf_text(empty_pdf) == ""


# ---------------------------------------------------------------------------
# PDF: Spark read path (binaryFile + mapInPandas)
# ---------------------------------------------------------------------------


def test_read_pdf_documents_spark_path(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(
        build_pdf([["Doc A line one", "Doc A line two"]], compress=True)
    )
    (tmp_path / "b.pdf").write_bytes(build_pdf([["Doc B only line"]]))
    df = blocks.read_pdf_documents(spark, str(tmp_path / "*.pdf"))
    rows = {r["path"].split("/")[-1]: r["text"] for r in df.collect()}
    assert rows["a.pdf"] == "Doc A line one\nDoc A line two"
    assert rows["b.pdf"] == "Doc B only line"


def test_read_pdf_documents_raises_reference_error_when_unextractable(spark, tmp_path):
    (tmp_path / "scan.pdf").write_bytes(b"%PDF-1.4\nno objects here\n%%EOF")
    df = blocks.read_pdf_documents(spark, str(tmp_path / "scan.pdf"))
    with pytest.raises(Exception, match="No extractable text found in PDF"):
        df.collect()


def test_pdf_to_structured_table_end_to_end(spark, tmp_path):
    """A PDF whose text body contains an embedded CSV block flows
    through extract_records → records_to_table like any text doc."""
    (tmp_path / "report.pdf").write_bytes(
        build_pdf([["quarterly report", "name,qty", "widget,5", "sprocket,7"]])
    )
    docs = blocks.read_pdf_documents(spark, str(tmp_path / "report.pdf"))
    tbl = blocks.records_to_table(spark, blocks.extract_records(docs))
    csv_rows = tbl.filter(F.col("_source_type") == "csv").select("name", "qty").collect()
    assert {(r["name"], r["qty"]) for r in csv_rows} >= {("widget", "5"), ("sprocket", "7")}


# ---------------------------------------------------------------------------
# HTML: parser unit tests (bs4-semantics)
# ---------------------------------------------------------------------------

HTML_DOC = """<html><body>
<div class="card main" id="d1"><h2>Title here</h2><p>Hello <b>world</b>!</p></div>
<ul><li>item one</li><li>it</li></ul>
<br><img src="x.png">
<a href="/x" rel="nofollow noopener">Link text</a>
</body></html>"""


def test_html_pre_order_and_text_concatenation():
    rows = iter_tag_rows(HTML_DOC)
    tags = [r["_html_tag"] for r in rows]
    assert tags == ["html", "body", "div", "h2", "p", "b", "ul", "li", "a"]
    div = rows[2]
    # bs4 get_text(strip=True): strings stripped then joined with ""
    assert div["_html_text"] == "Title hereHelloworld!"
    assert rows[4]["_html_text"] == "Helloworld!"


def test_html_multivalued_attrs_stringify_like_bs4():
    rows = {r["_html_tag"]: r for r in iter_tag_rows(HTML_DOC)}
    assert rows["div"]["_html_attr_class"] == "['card', 'main']"
    assert rows["div"]["_html_attr_id"] == "d1"
    assert rows["a"]["_html_attr_rel"] == "['nofollow', 'noopener']"
    assert rows["a"]["_html_attr_href"] == "/x"


def test_html_min_text_length_filter():
    tags = [r["_html_tag"] for r in iter_tag_rows("<p>abcd</p><p>abc</p>")]
    assert tags == ["p"]  # "abc" is exactly 3 chars -> dropped (> 3 rule)


def test_html_malformed_markup_tolerated():
    rows = iter_tag_rows("<div><p>unclosed para</i><span>span text</span>")
    tags = [r["_html_tag"] for r in rows]
    assert "div" in tags and "p" in tags and "span" in tags
    # stray </i> ignored; div text includes both descendants
    assert [r for r in rows if r["_html_tag"] == "div"][0]["_html_text"] == (
        "unclosed paraspan text"
    )


def test_html_void_elements_take_no_children():
    rows = iter_tag_rows("<div><br>after the break</div>")
    assert [r["_html_tag"] for r in rows] == ["div"]


def test_html_entities_decoded():
    rows = iter_tag_rows("<p>a &amp; b &lt;tag&gt;</p>")
    assert rows[0]["_html_text"] == "a & b <tag>"


def test_html_matches_bs4_if_available():
    bs4 = pytest.importorskip("bs4")
    soup = bs4.BeautifulSoup(HTML_DOC, "html.parser")
    expected = []
    for tag in soup.find_all(True):
        t = tag.get_text(strip=True)
        if t and len(t) > 3:
            row = {"_html_tag": tag.name, "_html_text": t}
            for attr, val in tag.attrs.items():
                row[f"_html_attr_{attr}"] = str(val)
            expected.append(row)
    assert iter_tag_rows(HTML_DOC) == expected


# ---------------------------------------------------------------------------
# HTML: Spark read path
# ---------------------------------------------------------------------------


def test_html_records_spark_path(spark, tmp_path):
    (tmp_path / "page.txt").write_text(HTML_DOC)
    docs = blocks.read_text_documents(spark, str(tmp_path / "page.txt"))
    tbl = blocks.records_to_table(spark, blocks.extract_records(docs))
    html = tbl.filter(F.col("_source_type") == "html")
    rows = {r["_html_tag"]: r for r in html.select("_html_tag", "_html_text", "_html_attr_class").collect()}
    assert rows["div"]["_html_text"] == "Title hereHelloworld!"
    assert rows["div"]["_html_attr_class"] == "['card', 'main']"
    assert "h2" in rows and "a" in rows
