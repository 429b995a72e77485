"""HTML -> text extraction — the boilerplate-stripping stage between WARC
ingest and every text operator in the engine.

From-scratch on ``html.parser`` (stdlib): script/style/comment content is
dropped, block-level tags break lines, inline tags vanish, character
references decode, whitespace collapses per line. The semantics are pinned
two ways: hand-written adversarial fragments in tests/test_html.py, and
the deterministic synth round-trip q74 (extract(synth_html(doc)) must
reproduce the document text exactly, which a DuckDB oracle can state in
pure SQL).

Scale shape: a narrow Arrow-batched map stage — no shuffle, one Python
worker per core; the regex/parse cost is per-document and embarrassingly
parallel, the same budget class as the shingle kernels.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# Tags whose boundaries break text lines; everything else is inline.
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "title", "tr", "ul",
}
_SKIP_TAGS = {"script", "style", "template"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs decodes &amp;/&#169;-style references into the
        # data stream before we see it
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self._skip = 0
        self._in_title = False

    # Block boundaries are marked with NUL (never legal in HTML text), so
    # raw newlines inside a text node stay ordinary collapsible
    # whitespace — <p>a\n\nb</p> is one line "a b", not two.
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self.parts.append("\x00")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip > 0:
            self._skip -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self.parts.append("\x00")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.parts.append("\x00")

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self.title_parts.append(data)
        else:
            self.parts.append(data)


def extract_html(html: str) -> tuple[str, str]:
    """(title, text) of one HTML document. Lines = block-tag-delimited
    chunks, inner whitespace collapsed, empty lines dropped."""
    p = _Extractor()
    p.feed(html or "")
    p.close()
    lines = []
    for chunk in "".join(p.parts).split("\x00"):
        line = " ".join(chunk.split())
        if line:
            lines.append(line)
    title = " ".join("".join(p.title_parts).split())
    return title, "\n".join(lines)


_OUT = StructType(
    [StructField("title", StringType()), StructField("text", StringType())]
)


@F.pandas_udf(_OUT)
def html_to_text(html: pd.Series) -> pd.DataFrame:
    """Vectorized extraction: html string column -> struct(title, text)."""
    pairs = [extract_html(h) for h in html]
    return pd.DataFrame(pairs, columns=["title", "text"])
