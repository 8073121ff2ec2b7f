"""Document ingest sources vs the reference's own fixtures/assertions."""

import pytest

OPENXML = "/root/reference/tests/_openXmlDocuments"
HTML_SRC = "/root/reference/tests/_indexSource/_files"


def test_parse_html_title_body_links():
    from lucene_spark.sources import parse_html

    data = open(f"{HTML_SRC}/contributing.html", "rb").read()
    doc = parse_html(data)
    assert doc.title  # has a <title>
    assert "PEAR" in doc.body or "pear" in doc.body.lower()
    assert doc.links  # PEAR pages are full of links
    # block boundaries insert spaces: no glued words across <td>/<p>
    assert "  " in doc.body or " " in doc.body


def test_parse_html_fragment_and_inline_tags():
    from lucene_spark.sources import parse_html

    doc = parse_html("pre <b>bold</b>mid<p>para</p>")
    # inline <b> adds no trailing space; block <p> does
    assert "boldmid" in doc.body
    assert "para " in doc.body


def test_html_fields_dataframe(spark):
    from lucene_spark.sources import html_fields

    rows = [(i, open(f"{HTML_SRC}/{n}", "rb").read().decode("iso-8859-1"))
            for i, n in enumerate(["authors.html", "core.html"])]
    df = spark.createDataFrame(rows, "doc_id long, raw string")
    out = html_fields(df, "raw").select("doc_id", "html.title", "html.body").collect()
    assert len(out) == 2
    assert all(r["title"] for r in out)
    assert all(len(r["body"]) > 100 for r in out)


@pytest.mark.parametrize("kind", ["docx", "xlsx", "pptx"])
def test_openxml_reference_fixtures(kind):
    """Reference DocumentTest assertions (tests/DocumentTest.php:229-281):
    title == 'Test document', description matches, body non-empty,
    xlsx body contains 'ipsum'."""
    from lucene_spark.sources import openxml_fields

    blob = open(f"{OPENXML}/test.{kind}", "rb").read()
    doc = openxml_fields(blob, kind)
    assert doc["title"] == "Test document"
    assert (
        doc["description"]
        == "This is a test document which can be used to demonstrate something."
    )
    assert doc["body"] != ""
    if kind == "xlsx":
        assert "ipsum" in doc["body"]


def test_openxml_dataframe_and_index(spark, tmp_path):
    """Binary-column plumbing: blobs → parsed struct → searchable index."""
    from pyspark.sql import functions as F

    from lucene_spark.index import IndexConfig, build_index
    from lucene_spark.search.executor import SparkSearcher
    from lucene_spark.sources.openxml import openxml_fields_df

    rows = [
        (i, f"test{s}", open(f"{OPENXML}/test{s}.docx", "rb").read(), "docx")
        for i, s in enumerate(["", "2", "3"])
    ]
    df = spark.createDataFrame(rows, "doc_id long, name string, blob binary, kind string")
    parsed = openxml_fields_df(df, "blob", "kind").select(
        "doc_id", "name", F.col("doc.title").alias("title"),
        F.col("doc.body").alias("body"),
    )
    cfg = IndexConfig(field_policy={"title": "text", "body": "text", "name": "keyword"})
    ix = build_index(spark, parsed, str(tmp_path / "ix"), cfg, order_cols=["doc_id"])
    hits = SparkSearcher(ix).search("body:the", k=5).collect()
    assert hits
