"""HTML -> text extraction: the input_hint's byte-identity invariant.

The extractor is pinned two independent ways (the codec lesson from
test_jpeg.py): hand-written HTML snippets with expected text — independent
of the renderer — plus render->extract round-trips (hypothesis-driven over
arbitrary text) whose fixed point is normalize_text.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mashing_pumpkins_spark.operators.extraction import (
    extract_text,
    normalize_text,
    render_html,
)

# ---------------------------------------------------------------- extractor
# Hand-written snippets: expected text derived by reading the HTML, never
# by running the renderer.
SNIPPETS = [
    (b"<p>plain words here</p>", "plain words here"),
    (
        b"<html><head><title>T</title><script>var x='<p>hi</p>';</script>"
        b"</head><body><p>A&amp;B</p><div>c  d</div></body></html>",
        "A&B\nc d",
    ),
    (b"<p>x<!-- comment -->y</p>", "xy"),
    (b"<p>a<br>b</p>", "a\nb"),
    (b"<p>a<br/>b</p>", "a\nb"),
    (b"<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
    (b"<p>&#233;&#xe9;&eacute;</p>", "\xe9\xe9\xe9"),
    (b"<p>a&nbsp;&nbsp;b</p>", "a b"),  # NBSP is whitespace for collapse
    (b"<style>p{color:red}</style><p>ok</p>", "ok"),
    (b"<p>one</p><noscript>no js</noscript><p>two</p>", "one\ntwo"),
    (b"<table><tr><td>a</td><td>b</td></tr></table>", "a\nb"),
    (b'<a href="https://x.example/?a=1&amp;b=2">link</a>', "link"),
    (b"<div><b>bo</b><em>ld</em></div>", "bold"),  # inline tags don't split
    (b"<h1>Title</h1><p>body</p>", "Title\nbody"),
    # head content (title/meta) is never visible text
    (b"<head><title>nope</title><meta x='y'></head><p>yes</p>", "yes"),
    # stray close tag must not unbalance the skip counter
    (b"</script></head><p>still here</p>", "still here"),
    # UTF-8 multibyte straight through
    ("<p>caf\xe9 東京</p>".encode("utf-8"), "caf\xe9 東京"),
    (b"", ""),
    (b"no tags at all", "no tags at all"),
    (b"<p></p><div>  </div>", ""),  # empty blocks dropped
]


@pytest.mark.parametrize("html,want", SNIPPETS, ids=range(len(SNIPPETS)))
def test_extract_snippets(html, want):
    assert extract_text(html) == want


def test_extract_rejects_bad_utf8():
    with pytest.raises(UnicodeDecodeError):
        extract_text(b"<p>\xff\xfe broken</p>")
    with pytest.raises(ValueError):
        extract_text(None)


def test_unclosed_script_swallows_tail():
    # HTMLParser treats script as CDATA until </script>; an unclosed one
    # swallows the rest — documented malformed-markup behavior.
    assert extract_text(b"<p>a</p><script>var x=1;<p>b</p>") == "a"


# --------------------------------------------------------------- round-trip
def test_roundtrip_identity_on_normal_text():
    texts = [
        "hello world foo bar",
        "caf\xe9 na\xefve 東京 d\xe9j\xe0 \xfcber",
        "a & b < c > d \"quoted\" 'apos'",
        "line one\nline two\nline three",
        " ".join(f"w{i}" for i in range(400)),
        "x",
    ]
    for t in texts:
        assert normalize_text(t) == t  # precondition: whitespace-normal
        assert extract_text(render_html(t, "https://ex.com/p")) == t


def test_renderer_is_deterministic_and_noisy():
    t = "some words in a page"
    a = render_html(t, "u1")
    assert a == render_html(t, "u1")
    assert a != render_html(t, "u2")  # url participates in the noise seed
    assert b"<script>" in a and b"<style>" in a and b"<!--" in a


_text_strategy = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00", exclude_categories=("Cs",)
    ),
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(_text_strategy)
def test_roundtrip_fixed_point_property(t):
    """extract(render(t)) == normalize_text(t) for ARBITRARY text, and
    normalize_text is idempotent (so whitespace-normal text is a true
    fixed point)."""
    norm = normalize_text(t)
    assert normalize_text(norm) == norm
    assert extract_text(render_html(t, "https://h.example/x")) == norm


# -------------------------------------------------------------------- spark
def test_spark_extraction_report_and_null_contract(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.extraction import (
        extraction_report,
        with_extracted_text,
    )

    rows = pd.DataFrame(
        {
            "url": ["u0", "u1", "u2", "u3"],
            "html": [
                render_html("alpha beta gamma", "u0"),
                render_html("caf\xe9 東京 words", "u1"),
                b"<p>\xff\xfebad utf8</p>",  # undecodable -> null row
                None,
            ],
            "text": ["alpha beta gamma", "caf\xe9 東京 words", "x", "y"],
        }
    )
    df = spark.createDataFrame(rows)
    out = {r["url"]: r for r in with_extracted_text(df).collect()}
    assert out["u0"]["extracted_text"] == "alpha beta gamma"
    assert out["u1"]["extracted_text"] == "caf\xe9 東京 words"
    assert out["u2"]["extracted_text"] is None
    assert out["u3"]["extracted_text"] is None

    rep = {r["url"]: r for r in extraction_report(df).collect()}
    assert rep["u0"]["extract_ok"] and rep["u1"]["extract_ok"]
    assert rep["u0"]["n_chars"] == len("alpha beta gamma")
    assert rep["u2"]["extract_ok"] is None  # null extraction -> null, not False

    # the parser UDF must appear exactly once in the report plan
    plan = rep_plan = extraction_report(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("_extract_text_udf") <= 1 or plan.count("ArrowEvalPython") <= 1


def test_spark_pages_byte_identity(spark):
    """The north-star invariant on the synthetic pages corpus: extraction
    reproduces the text column byte-for-byte on every row."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mashing_pumpkins_spark.operators.extraction import extraction_report
    from mashing_pumpkins_spark.sources.synthetic import generate_pages

    pages, _ = generate_pages(120, seed=7)
    df = spark.createDataFrame(pages)
    rep = extraction_report(df)
    bad = rep.where(~F.col("extract_ok") | F.col("extract_ok").isNull()).count()
    assert bad == 0


# ------------------------------------------------------- main content
def test_main_text_drops_link_dense_blocks():
    from mashing_pumpkins_spark.operators.extraction import extract_main_text

    html = (
        b'<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a>'
        b"</li></ul></nav>"
        b"<p>real prose with <a href='/x'>one link</a> inside a long sentence"
        b" of ordinary words</p>"
        b'<footer><a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
    )
    assert extract_main_text(html) == (
        "real prose with one link inside a long sentence of ordinary words"
    )
    # threshold edge: exactly half anchored chars is dropped (>= cut)
    half = b"<p><a href='/'>aaaa</a> bbb</p>"  # 4 link / 8 total (.5 raw)
    assert extract_main_text(half) == ""
    under = b"<p><a href='/'>aaa</a> bbbb</p>"  # 3 link / 8 total
    assert extract_main_text(under) == "aaa bbbb"


def test_boilerplate_roundtrip_and_detection():
    from mashing_pumpkins_spark.operators.extraction import (
        extract_main_text,
        extract_text,
        render_html,
    )

    t = "ordinary document words spanning enough tokens for stable density"
    page = render_html(t, "https://x.example/d", boilerplate=True)
    assert extract_main_text(page) == t
    full = extract_text(page)
    assert len(full) > len(t)  # the menus really were in the page
    # without boilerplate both extractors agree
    plain = render_html(t, "https://x.example/d")
    assert extract_main_text(plain) == extract_text(plain) == t


def test_spark_main_text_null_contract(spark):
    import pandas as pd

    from mashing_pumpkins_spark.operators.extraction import main_text_col

    df = spark.createDataFrame(
        pd.DataFrame({"html": [b"<p>ok words here</p>", b"\xff\xfe", None]})
    )
    vals = [r["m"] for r in df.select(main_text_col("html").alias("m")).collect()]
    assert vals == ["ok words here", None, None]
