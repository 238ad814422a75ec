"""HTML/markup → text extraction — the true first stage of every
web-corpus pretraining pipeline (raw crawl HTML must become plain
text before quality scoring, language ID, dedup, or tokenization see
it).

Built on the stdlib ``html.parser`` (tolerant, never needs external
packages) inside an Arrow-batched ``mapInPandas``: per-document
independent, map-only, no shuffle — embarrassingly parallel at any
scale, the same execution shape as the image/audio decoders in
:mod:`topn_spark.operators.multimodal`.

Extraction contract (deterministic, mirrored by the z13 oracle):

* ``<script>``, ``<style>``, ``<noscript>``, ``<template>`` and the
  whole ``<head>`` are dropped (``<title>`` text is captured into its
  own column, not the body text);
* comments and processing instructions are dropped;
* character and entity references are decoded (``&amp;`` → ``&``);
* BLOCK-level boundaries (``p div li ul ol h1-h6 tr td th table br hr
  blockquote pre`` …) flush the current line; inline markup
  (``a b i em span strong code`` …) does not break the line;
* each flushed line is whitespace-collapsed (runs of whitespace →
  one space, stripped); empty lines are skipped; the document text is
  the newline-join of the surviving lines;
* ``n_links`` counts anchor tags carrying an ``href``;
* a document whose parse raises (pathological input past the
  tolerant parser) yields NULL title/text — a controlled per-row
  failure, never a task crash.

Reference parity note: the reference plugin (TopN.java) has no markup
stage; this implements the standard pretraining-pipeline front end
(public recipe: boilerplate-stripping text extraction as in CCNet /
RefinedWeb / Gopher preprocessing descriptions).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame

#: elements whose entire subtree is dropped from body text
SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head"}
)

#: elements that terminate the current text line when opened or closed
BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "br", "caption",
        "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5",
        "h6", "header", "hr", "legend", "li", "main", "nav", "ol",
        "option", "p", "pre", "section", "select", "summary",
        "table", "tbody", "td", "tfoot", "th", "thead", "title",
        "tr", "ul",
    }
)


class _TextExtractor(HTMLParser):
    """Streaming extractor implementing the module contract."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._in_title = False
        self._buf: list[str] = []
        self._lines: list[str] = []
        self._title: list[str] = []
        self.n_links = 0

    def _flush(self) -> None:
        line = " ".join("".join(self._buf).split())
        self._buf.clear()
        if line:
            self._lines.append(line)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        if tag == "title":
            self._in_title = True
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/>-style self-closing: block boundary, no skip nesting
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS and self._skip > 0:
            self._skip -= 1
        if tag == "title":
            self._in_title = False
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title.append(data)
        elif self._skip == 0:
            self._buf.append(data)

    def result(self) -> tuple[str | None, str]:
        self._flush()
        title = " ".join("".join(self._title).split())
        return (title or None, "\n".join(self._lines))


def html_to_text(html: str | None) -> tuple[str | None, str | None, int]:
    """Extract ``(title, text, n_links)`` from one HTML document per
    the module contract; ``(None, None, 0)`` for null input or a
    parse that raises."""
    if html is None:
        return (None, None, 0)
    try:
        p = _TextExtractor()
        p.feed(html)
        p.close()
        title, text = p.result()
        return (title, text, p.n_links)
    except Exception:
        return (None, None, 0)


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Markup → text over a corpus: ``(id, *keep_cols, title, text,
    n_links)`` per document. One Arrow-batched ``mapInPandas`` pass —
    map-only, no shuffle, each 100 TB partition independent; the
    parser is stdlib, so tasks carry no model state at all.
    ``keep_cols`` are carried through the pass verbatim (URI, crawl
    date, ...) — re-joining them back by id after extraction would
    recompute or shuffle the whole corpus for columns that were
    already in hand."""
    idt = df.schema[id_col].dataType.simpleString()
    kept = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}"
        for c in keep_cols
    )
    schema = (
        f"{id_col} {idt}{kept}, title string, text string, n_links int"
    )

    def _run(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            out = [html_to_text(h) for h in pdf[html_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    **{c: pdf[c].values for c in keep_cols},
                    "title": [t for t, _, _ in out],
                    "text": [x for _, x, _ in out],
                    "n_links": [n for _, _, n in out],
                }
            )

    return df.select(id_col, *keep_cols, html_col).mapInPandas(
        _run, schema
    )
