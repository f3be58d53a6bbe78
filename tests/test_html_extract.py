"""HTML -> text extraction semantics (textprep.extract_html_text /
html_extract_documents): crafted-page behavior pins for every rule in
HTML_STRIP_STEPS, cross-engine byte parity on dirty input, and the
WARC -> extraction integration (the crawl-ingest pipeline head)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from simple_anonymizer_spark.operators import textprep as T

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(T.extract_html_text("html").alias("t")).first().t


def test_script_style_comment_content_dropped(spark):
    out = _extract(spark, "<p>keep</p><script>var leak = 1;</script>"
                          "<style>.x{a:b}</style><!-- secret -->")
    assert out == "keep"
    # case-insensitive, attributes, embedded newlines
    out2 = _extract(spark, "A<SCRIPT type='x'>\nmulti\nline\n</SCRIPT >B")
    assert out2 == "A B"


def test_block_structure_becomes_newlines(spark):
    out = _extract(spark, "<h1>Title</h1><p>one</p><p>two</p>"
                          "<ul><li>a</li><li>b</li></ul>end<br>next")
    # </li></ul> = two block closers = one blank line (paragraph break,
    # capped by normalize_text's 3+ newline collapse)
    assert out == "Title\none\ntwo\na\nb\n\nend\nnext"


def test_inline_tags_strip_without_joining_words(spark):
    assert _extract(spark, "a<b>bold</b>c <em>x</em>y") == "a bold c x y"


def test_entities_decode_single_pass(spark):
    out = _extract(spark, "&lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;"
                          " &nbsp;sp &amp;lt;literal")
    # &amp;lt; decodes to the literal '&lt;', never resurrects a tag
    assert out == '<tag> & "q" \'s\' sp &lt;literal'


def test_report_title_and_link_census(spark):
    html = ('<html><head><title>My Page</title></head><body>'
            '<a href="http://a">1</a><a class="x" href="/b">2</a>'
            '<a name="anchor">not a link</a></body></html>')
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    r = T.html_extract_documents(df).first()
    assert r.doc_id == 7
    assert r.title == "My Page"
    assert r.n_links == 2
    assert r.text == "My Page\n1 2 not a link"


def test_empty_and_tagless_inputs(spark):
    assert _extract(spark, "") == ""
    assert _extract(spark, "plain  text   here") == "plain text here"
    assert _extract(spark, "<div><script>x</script></div>") == ""


@pytest.mark.parametrize("dirty", [
    "<p>a</p \x0c><p>b</p>",               # malformed closer with FF
    "<p>unclosed <b>nested",               # unclosed tags
    "text > loose < not-a-tag",            # bare angle brackets
    "<P ALIGN='x'>caps</P><BR/>y",         # case + self-closing
    "&amp;amp;&#0039;",                    # stacked entities
])
def test_cross_engine_byte_parity_on_dirty_input(spark, dirty):
    got = _extract(spark, dirty)
    sql = T.extract_html_text_sql("h")
    want = duckdb.sql(
        f"SELECT {sql} AS t FROM (SELECT ? AS h)", params=[dirty]
    ).fetchone()[0]
    assert got == want, f"engines disagree on {dirty!r}"


def test_warc_to_extraction_pipeline(spark, tmp_path):
    """The crawl-ingest head: WARC payloads -> html_extract_documents."""
    from simple_anonymizer_spark.sources.warc import read_warc, write_warc

    pages = spark.createDataFrame(
        [(1, "http://e.com/1",
          "<html><title>T1</title><p>body one</p></html>"),
         (2, "http://e.com/2",
          "<html><title>T2</title><script>no</script><p>body two</p></html>")],
        "page_id long, uri string, html string")
    out = str(tmp_path / "crawl")
    assert write_warc(pages, out, uri_col="uri", payload_col="html",
                      meta_cols=("page_id",),
                      content_type="text/html; charset=utf-8") == 2
    crawl = read_warc(spark, out).select(
        F.element_at("headers", "warc-x-meta-page_id").cast("long")
        .alias("doc_id"),
        F.col("payload").cast("string").alias("html"),
    )
    rows = {r.doc_id: r for r in T.html_extract_documents(crawl).collect()}
    assert rows[1].title == "T1" and rows[1].text == "T1\nbody one"
    assert rows[2].text == "T2\nbody two"  # script content never leaks
