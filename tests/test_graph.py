"""Link-graph operators: outlink extraction + exact-integer PageRank."""

from __future__ import annotations

import pytest

from mashing_pumpkins_spark.operators.graph import extract_links, pagerank

TOTAL = 10**12


def _pagerank_ref(n, edge_list, n_iter=10, d=85, total=TOTAL):
    """Independent plain-python reference of the fixed-point spec."""
    base = total // n
    deg = {}
    edges = sorted({(s, t) for (s, t) in edge_list if s != t})
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    dangling = [i for i in range(n) if i not in deg]
    r = {i: base for i in range(n)}
    for _ in range(n_iter):
        ds = sum(r[i] for i in dangling) // n
        c = {}
        for s, t in edges:
            c[t] = c.get(t, 0) + r[s] // deg[s]
        r = {i: ((100 - d) * base + d * (c.get(i, 0) + ds)) // 100 for i in range(n)}
    return r


def test_pagerank_matches_integer_reference_exactly(spark):
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2)]
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        r["id"]: r["rank"] for r in pagerank(nodes, edges, n_iter=10).collect()
    }
    assert got == _pagerank_ref(5, edge_list, n_iter=10)
    # node 4 is dangling AND unlinked: only teleport + dangling share
    assert got[4] == min(got.values())


def test_pagerank_mass_is_conserved_up_to_floor_dust(spark):
    """Each step loses at most a deterministic dust of mass to floor
    division — total rank stays within n_iter * (N + 100 + deg-loss)
    units of the initial mass, i.e. relatively ~1e-9, never drifts."""
    edge_list = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = pagerank(nodes, edges, n_iter=10).collect()
    total = sum(r["rank"] for r in out)
    assert abs(total - TOTAL) < 10_000  # dust, not drift
    assert all(r["rank"] > 0 for r in out)


def test_pagerank_drops_foreign_edges_self_loops_and_dups(spark):
    """Edges to pages outside the node set (the normal crawl case),
    self-loops and duplicate edges must not change the result."""
    nodes = spark.createDataFrame([(i,) for i in range(3)], "id long")
    clean = [(0, 1), (1, 2)]
    noisy = clean + [(0, 1), (1, 1), (0, 99), (98, 2)]
    a = pagerank(nodes, spark.createDataFrame(clean, "src long, dst long")).collect()
    b = pagerank(nodes, spark.createDataFrame(noisy, "src long, dst long")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_validates_parameters(spark):
    nodes = spark.createDataFrame([(0,)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(nodes, edges, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank(nodes, edges, n_iter=0)


def test_pagerank_empty_nodes_returns_empty(spark):
    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(nodes, edges).collect() == []


def test_extract_links_absolute_only_no_self_loops(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a",
                '<a href="http://b">x</a><a href="/rel">r</a>'
                '<a href="http://a">self</a><img href="https://c/i.png">'
                '<a href="http://b">dup</a>',
            ),
            ("http://b", "<p>no links</p>"),
        ],
        "url string, html string",
    )
    got = sorted((r["src"], r["dst"]) for r in extract_links(pages).collect())
    assert got == [("http://a", "http://b"), ("http://a", "https://c/i.png")]


def test_extract_anchor_texts_keeps_duplicates_and_attrs(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a",
                '<a href="http://b">first</a>'
                '<a href="http://b" class="nav" rel="x">second</a>'
                '<a href="http://b"></a>'          # empty anchor kept
                '<a href="/rel">rel dropped</a>'
                '<a href="http://a">self dropped</a>',
            ),
        ],
        "url string, html string",
    )
    from mashing_pumpkins_spark.operators.graph import extract_anchor_texts

    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_anchor_texts(pages).collect()
    )
    assert got == [
        ("http://a", "http://b", ""),
        ("http://a", "http://b", "first"),
        ("http://a", "http://b", "second"),
    ]


def test_extract_anchor_texts_nested_tag_stops_body(spark):
    """[^<]* stops at the first nested tag: such anchors don't match
    (documented scope), never mis-capture."""
    pages = spark.createDataFrame(
        [("http://a", '<a href="http://b"><b>bold</b></a><a href="http://c">ok</a>')],
        "url string, html string",
    )
    from mashing_pumpkins_spark.operators.graph import extract_anchor_texts

    got = [(r["dst"], r["anchor"]) for r in extract_anchor_texts(pages).collect()]
    assert got == [("http://c", "ok")]


def test_degree_stats_zero_fills_isolated_nodes(spark):
    from mashing_pumpkins_spark.operators.graph import degree_stats

    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    got = {
        r["id"]: (r["out_deg"], r["in_deg"])
        for r in degree_stats(edges, nodes).collect()
    }
    assert got == {0: (2, 0), 1: (1, 1), 2: (0, 2), 3: (0, 0)}


def test_extract_links_binary_html(spark):
    pages = spark.createDataFrame(
        [("http://a", '<a href="http://b">x</a>'.encode("utf-8"))],
        "url string, html binary",
    )
    got = [(r["src"], r["dst"]) for r in extract_links(pages).collect()]
    assert got == [("http://a", "http://b")]
