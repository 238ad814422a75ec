"""HTML -> text extraction (operators/markup.py): contract cases,
malformed-input gates, and a never-crash fuzz sweep. The oracled
closed-form fixtures live in the z13 catalog entry; these tests cover
what planted well-formed shapes cannot."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from topn_spark.operators.markup import extract_html_text, html_to_text


def test_basic_contract():
    title, text, n_links = html_to_text(
        "<html><head><title> My  Page </title><style>b{}</style>"
        "</head><body><h1>Head</h1><p>one <b>two</b> three</p>"
        "<script>drop()</script><p>four &amp; five</p>"
        "<!-- <p>ghost</p> --></body></html>"
    )
    assert title == "My Page"
    assert text == "Head\none two three\nfour & five"
    assert n_links == 0


def test_links_and_inline_vs_block():
    _, text, n_links = html_to_text(
        '<div>a <a href="/x">b</a> c</div>'
        '<div><a name="anchor-no-href">d</a></div>'
        '<p>e<br/>f</p><a href="h">g</a>'
    )
    # anchor without href is not a link; br is a line break
    assert n_links == 2
    assert text == "a b c\nd\ne\nf\ng"


def test_malformed_unclosed_and_stray_tags():
    # unclosed blocks, stray end tags, orphan '<': tolerant, no raise
    title, text, n_links = html_to_text(
        "</div></head><p>alpha <b>beta</p></b>raw < 5 text<li>item"
    )
    assert title is None
    assert "alpha beta" in text
    assert "item" in text
    assert n_links == 0
    # a stray </head> must not unbalance skipping: body text survives
    assert "raw" in text


def test_nested_skip_and_title_outside_head():
    _, text, _ = html_to_text(
        "<script><style>not text</style>also not</script><p>kept</p>"
    )
    assert text == "kept"
    title, text2, _ = html_to_text(
        "<body><title>late title</title><p>body</p></body>"
    )
    assert title == "late title"
    assert text2 == "body"


def test_null_and_empty():
    assert html_to_text(None) == (None, None, 0)
    assert html_to_text("") == (None, "", 0)
    assert html_to_text("plain text only") == (None, "plain text only", 0)


@settings(max_examples=120, deadline=None)
@given(junk=st.text(max_size=300))
def test_extractor_never_crashes_on_garbage(junk):
    """Arbitrary text — including half-open tags and entity-looking
    noise — must extract without raising; a raise here would crash a
    whole Spark task on one bad crawl record."""
    for payload in (junk, "<p" + junk, "<script>" + junk, junk + "</"):
        title, text, n_links = html_to_text(payload)
        assert n_links >= 0
        assert text is None or isinstance(text, str)


def test_extract_html_text_dataframe(spark):
    df = spark.createDataFrame(
        [
            (1, "<body><h1>A</h1><p>b c</p></body>"),
            (2, None),
            (3, '<p>x <a href="u">y</a></p>'),
        ],
        "doc_id long, html string",
    )
    got = {r.doc_id: r for r in extract_html_text(df).collect()}
    assert got[1].text == "A\nb c"
    assert got[2].text is None and got[2].n_links == 0
    assert got[3].text == "x y" and got[3].n_links == 1


def test_extract_keep_cols_passthrough(spark):
    from topn_spark.operators.markup import extract_html_text

    df = spark.createDataFrame(
        [(1, "http://a/", "<body><p>hello world</p></body>")],
        "doc_id long, uri string, html string",
    )
    out = extract_html_text(df, keep_cols=("uri",)).collect()
    assert out[0].uri == "http://a/"
    assert out[0].text == "hello world"
