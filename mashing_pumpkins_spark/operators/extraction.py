"""HTML -> text extraction for Common-Crawl-style pages.

The input contract (BASELINE.json ``input_hint``) models a crawl table with
both ``html: binary`` and ``text: string`` per url, and the per-row
invariant that the extracted text is *byte-identical* to the ``text``
column. This module supplies both directions:

- :func:`extract_text` — a pure-stdlib (``html.parser``) extractor that
  turns an HTML payload into normalized visible text: script/style/head
  content, comments, and attribute values are dropped; character and
  entity references are decoded; whitespace inside a block element is
  collapsed to single spaces; block elements are joined with ``\\n``.
- :func:`render_html` — a deterministic page renderer used by the
  synthetic corpus and the correctness oracle: it wraps each text line in
  ``<p>`` with inline markup, entity encoding, comments, and head/script/
  style noise such that ``extract_text(render_html(t)) == t`` for any
  whitespace-normal ``t`` (and ``== normalize_text(t)`` for arbitrary
  ``t`` — see :func:`normalize_text`).

The round-trip is the correctness gate (query ``html_extraction``): the
Spark side renders real HTML and parses it back; the SQL oracle replays
the invariant directly from the ``text`` column (``md5(text)``), the same
encode->decode pattern as the PNG/JPEG codec oracles.

Scale shape: both directions are Arrow-batched pandas UDFs over a single
column — no shuffle, no state; at 100 TB this runs at scan speed alongside
the sketch kernel. Boilerplate *visible* text (nav menus and the like) is
out of scope for the byte-identity invariant: the renderer keeps noise in
regions the extractor provably drops, and real-crawl boilerplate removal
belongs to the Gopher/C4 battery (operators/corpus.py), not here.

Reference parity note: mashing-pumpkins itself has no HTML stage (its
inputs are FASTA/FASTQ — src/sequence.py); this operator exists for the
web-pages input shape the north star mandates.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, StringType

from ..hashkernels import xxh64

_WS = re.compile(r"\s+")

# Content of these elements is never visible text.
_SKIP_TAGS = {"script", "style", "template", "head", "title", "noscript", "svg"}

# Elements that delimit text blocks (extraction joins blocks with "\n").
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "br", "dd", "div", "dl",
    "dt", "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol", "p",
    "pre", "section", "table", "tbody", "td", "tfoot", "th", "thead", "tr",
    "ul",
}

# Void elements never push a skip scope (no matching end tag).
_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "source", "wbr", "area", "base", "col", "embed", "track"}


class _TextExtractor(HTMLParser):
    """Streaming visible-text collector.

    ``convert_charrefs=True`` decodes named and numeric character
    references in data (``&amp;`` ``&#233;`` ``&#xE9;``) before
    ``handle_data`` sees them; script/style bodies arrive raw (HTMLParser
    CDATA handling) and are dropped by the skip counter.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._link_depth = 0
        self._buf: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self.blocks: list[str] = []
        #: per-block (collapsed_text, raw_link_chars, raw_total_chars) —
        #: the raw counts drive link-density boilerplate scoring
        self.block_stats: list[tuple[str, int, int]] = []

    def flush_block(self) -> None:
        if self._buf:
            s = _WS.sub(" ", "".join(self._buf)).strip()
            link, total = self._link_chars, self._total_chars
            self._buf = []
            self._link_chars = 0
            self._total_chars = 0
            if s:
                self.blocks.append(s)
                self.block_stats.append((s, link, total))

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            if tag not in _VOID_TAGS:
                self._skip += 1
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self.flush_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            # max() guards stray close tags in malformed markup
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self.flush_block()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:  # e.g. <br/>
            self.flush_block()

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self._buf.append(data)
            n = len(data.strip())
            self._total_chars += n
            if self._link_depth > 0:
                self._link_chars += n


def extract_text(payload) -> str:
    """Extract normalized visible text from an HTML payload.

    Accepts ``bytes`` (strict UTF-8 — undecodable payloads raise, the
    Spark wrapper nulls the row) or ``str``. Whitespace semantics: within
    a block, runs of Unicode whitespace (including NBSP from ``&nbsp;``)
    collapse to one space and block edges are stripped; empty blocks are
    dropped; blocks join with ``\\n``. ``<pre>`` is normalized like any
    other block (documented tradeoff: the invariant targets
    whitespace-normal crawl text, not source-code fidelity).
    """
    return "\n".join(_parse(payload).blocks)


def _parse(payload) -> _TextExtractor:
    if payload is None:
        raise ValueError("null payload")
    if isinstance(payload, (bytes, bytearray, memoryview)):
        text = bytes(payload).decode("utf-8")
    else:
        text = payload
    parser = _TextExtractor()
    parser.feed(text)
    parser.close()
    parser.flush_block()
    return parser


def extract_main_text(
    payload,
    max_link_density: float = 0.5,
) -> str:
    """Main-content extraction (readability/trafilatura-style boilerplate
    removal): like :func:`extract_text`, but drops blocks whose
    link-density (anchored chars / total chars, pre-collapse) reaches
    ``max_link_density`` — nav menus, related-links sidebars, and footer
    link rows are nearly all anchor text, while prose blocks sit far
    below the cut. The heuristic is the classic density rule (Kohlschütter
    et al.'s boilerplate signal reduced to its strongest single feature);
    content blocks that are a single wall-to-wall link are
    indistinguishable from menu items under any density rule — the
    documented tradeoff of the entire approach."""
    parser = _parse(payload)
    kept = [
        text
        for text, link, total in parser.block_stats
        if total == 0 or link / total < max_link_density
    ]
    return "\n".join(kept)


def normalize_text(text: str) -> str:
    """The fixed point of render -> extract for arbitrary input: per line,
    collapse whitespace runs to single spaces and strip the edges; drop
    empty lines; join with ``\\n``. ``extract_text(render_html(t)) ==
    normalize_text(t)`` for all ``t``; for whitespace-normal ``t`` (the
    crawl contract) this is the identity."""
    lines = [_WS.sub(" ", ln).strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _render_word(word: str, h: int, i: int) -> str:
    """Escape one word and deterministically decorate it with inline
    markup / numeric charrefs the extractor must see through.

    Charref encoding is only applied to alphanumeric leading chars: HTML5
    remaps numeric references in the C1 range (0x80-0x9F) to their
    windows-1252 glyphs (e.g. &#142; parses as U+017D), so control chars
    are NOT charref-inverse-safe — hypothesis found this."""
    charref_safe = word and word[0].isalnum()
    if charref_safe and (h + i) % 19 == 2:
        enc = f"&#{ord(word[0])};" + escape(word[1:], quote=False)
    elif charref_safe and (h + i) % 19 == 9:
        enc = f"&#x{ord(word[0]):x};" + escape(word[1:], quote=False)
    else:
        enc = escape(word, quote=False)
    m = (h + i) % 11
    if m == 0:
        return f"<b>{enc}</b>"
    if m == 4:
        return f"<em>{enc}</em>"
    if m == 7:
        return f'<a href="/l/{i}?q=skip&amp;id={h % 997}">{enc}</a>'
    return enc


_MENU_WORDS = [
    "Home", "About", "Contact", "Archive", "Topics", "Search", "Login",
    "Subscribe", "Privacy", "Terms", "Sitemap", "Help",
]


def _boilerplate_nav(h: int, n: int, cls: str) -> str:
    """A link-dense block (menu / related-links / footer): every word is
    anchor text, so its link density is ~1.0 and extract_main_text drops
    the whole block."""
    items = [
        f'<a href="/{cls}/{(h + j) % 9973}">'
        f"{_MENU_WORDS[(h + j) % len(_MENU_WORDS)]}</a>"
        for j in range(n)
    ]
    return f'<nav class="{cls}"><ul><li>' + "</li><li>".join(items) + "</li></ul></nav>"


def render_html(text: str, url: str = "", lang: str = "en", boilerplate: bool = False) -> bytes:
    """Deterministically render ``text`` as a realistic UTF-8 HTML page.

    Each ``\\n``-separated line becomes one ``<p>`` block (so extraction's
    block-join with ``\\n`` inverts the split); words carry inline tags,
    entity encodings, comments, and intra-block newline noise, all of
    which normalize away. Head/style/script/comment noise is keyed off
    ``xxh64(text||url)`` so pages differ but are reproducible.
    """
    h = xxh64(text.encode("utf-8") + b"\x00" + url.encode("utf-8"))
    parts: list[str] = [
        "<!DOCTYPE html>",
        f'<html lang="{escape(lang)}">',
        "<head>",
        f"<title>{escape(url or f'page-{h % 100000}', quote=False)}</title>",
        '<meta charset="utf-8"/>',
        f"<style>body{{margin:0;padding:{h % 7}px}}/* s{h % 9973} */</style>",
        f'<script>var seed={h % 2**31};if(seed>0){{console.log("<p>not text</p>");}}</script>',
        "</head>",
        "<body>",
        f"<!-- rendered page {h % 99991} -->",
    ]
    if boilerplate:
        parts.append(_boilerplate_nav(h, 5 + h % 4, "topnav"))
        parts.append(_boilerplate_nav(h * 31 + 7, 4, "related"))
    parts.append('<div class="content">')
    for line in text.split("\n"):
        words = line.split(" ")
        rendered: list[str] = []
        for i, w in enumerate(words):
            rendered.append(_render_word(w, h, i))
            if (h + i) % 23 == 7:
                rendered.append(f"<!-- c{i} -->")
        sep_parts: list[str] = []
        for i, rw in enumerate(rendered):
            if i and (h + i) % 29 == 11:
                sep_parts.append("\n    ")
            elif i:
                sep_parts.append(" ")
            sep_parts.append(rw)
        parts.append("<p>" + "".join(sep_parts) + "</p>")
    parts.append("</div>")
    if boilerplate:
        parts.append(_boilerplate_nav(h * 17 + 3, 6, "footer"))
    parts.extend(
        [
            f"<script>window.__t={h % 8191};</script>",
            "<!-- footer -->",
            "</body>",
            "</html>",
        ]
    )
    return "\n".join(parts).encode("utf-8")


@pandas_udf(StringType())
def _extract_text_udf(payloads: pd.Series) -> pd.Series:
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        try:
            out.append(extract_text(p))
        except (ValueError, UnicodeDecodeError):
            out.append(None)
    return pd.Series(out, dtype="object")


@pandas_udf(StringType())
def _extract_main_text_udf(payloads: pd.Series) -> pd.Series:
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        try:
            out.append(extract_main_text(p))
        except (ValueError, UnicodeDecodeError):
            out.append(None)
    return pd.Series(out, dtype="object")


@pandas_udf(BinaryType())
def _render_boilerplate_html_udf(texts: pd.Series, urls: pd.Series) -> pd.Series:
    out = []
    for t, u in zip(texts, urls):
        if t is None:
            out.append(None)
        else:
            out.append(render_html(t, u if u is not None else "", boilerplate=True))
    return pd.Series(out, dtype="object")


@pandas_udf(BinaryType())
def _render_html_udf(texts: pd.Series, urls: pd.Series) -> pd.Series:
    out = []
    for t, u in zip(texts, urls):
        if t is None:
            out.append(None)
        else:
            out.append(render_html(t, u if u is not None else ""))
    return pd.Series(out, dtype="object")


def extracted_text_col(html_col) -> Column:
    """Column expression: extracted text (null for undecodable payloads).
    Arrow-batched; keep it in a projection so the scan stays pruned."""
    col = html_col if isinstance(html_col, Column) else F.col(html_col)
    return _extract_text_udf(col)


def rendered_html_col(text_col, url_col) -> Column:
    """Column expression: deterministic HTML rendering of (text, url)."""
    t = text_col if isinstance(text_col, Column) else F.col(text_col)
    u = url_col if isinstance(url_col, Column) else F.col(url_col)
    return _render_html_udf(t, u.cast("string"))


def main_text_col(html_col) -> Column:
    """Column expression: boilerplate-stripped main content (null for
    undecodable payloads). Arrow-batched, no shuffle."""
    col = html_col if isinstance(html_col, Column) else F.col(html_col)
    return _extract_main_text_udf(col)


def rendered_boilerplate_html_col(text_col, url_col) -> Column:
    """Column expression: HTML rendering WITH planted link-dense
    boilerplate (nav, related-links, footer) around the content."""
    t = text_col if isinstance(text_col, Column) else F.col(text_col)
    u = url_col if isinstance(url_col, Column) else F.col(url_col)
    return _render_boilerplate_html_udf(t, u.cast("string"))


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Attach extracted text to a pages frame. One Arrow-batched UDF, no
    shuffle; rows whose payload fails strict UTF-8 decode get null (the
    multimodal null-row contract)."""
    return df.withColumn(out_col, extracted_text_col(html_col))


def extraction_report(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Per-row invariant report: did extraction reproduce the text column
    byte-for-byte? Returns (id, extract_ok, extract_md5, n_chars).

    The UDF column is materialized in an inner projection so the parser
    runs once per row, not once per consuming expression."""
    inner = df.select(
        F.col(id_col),
        F.col(text_col),
        extracted_text_col(html_col).alias("_extracted"),
    )
    return inner.select(
        F.col(id_col),
        (F.col("_extracted") == F.col(text_col)).alias("extract_ok"),
        F.md5(F.col("_extracted").cast("binary")).alias("extract_md5"),
        F.length(F.col("_extracted")).cast("long").alias("n_chars"),
    )
