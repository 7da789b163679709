"""robots.txt parsing: section semantics, multi-agent groups, comments."""

from __future__ import annotations

from mashing_pumpkins_spark.sources.robots import parse_robots

BODY = """# global rules
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: fetchbot
User-agent: trainbot
Disallow: /nocrawl
Crawl-delay: 2

User-agent: greedybot
Disallow: /
"""


def _rows(spark, body, host="example.com"):
    df = spark.createDataFrame([(host, body)], "host string, body string")
    return [
        (r["agent"], r["directive"], r["value"])
        for r in parse_robots(df).collect()
    ]


def test_sections_and_shared_agent_groups(spark):
    got = _rows(spark, BODY)
    assert ("*", "disallow", "/private") in got
    assert ("*", "allow", "/private/ok") in got
    # consecutive user-agent headers share the following rules
    assert ("fetchbot", "disallow", "/nocrawl") in got
    assert ("trainbot", "disallow", "/nocrawl") in got
    assert ("fetchbot", "crawl-delay", "2") in got
    assert ("greedybot", "disallow", "/") in got
    # rules never leak across sections
    assert ("*", "disallow", "/nocrawl") not in got
    assert ("greedybot", "disallow", "/nocrawl") not in got


def test_comments_case_and_noise_lines(spark):
    body = (
        "USER-AGENT: MixedBot  # trailing comment\n"
        "disallow: /a   # comment\n"
        "not a directive line\n"
        "\n"
        "Disallow: /b\n"
    )
    got = _rows(spark, body)
    assert ("mixedbot", "disallow", "/a") in got
    assert ("mixedbot", "disallow", "/b") in got
    assert len(got) == 2


def test_rules_before_any_agent_are_dropped(spark):
    got = _rows(spark, "Disallow: /orphan\nUser-agent: a\nDisallow: /x\n")
    assert got == [("a", "disallow", "/x")]


def test_empty_disallow_kept_and_order_preserved(spark):
    body = "User-agent: a\nDisallow:\nDisallow: /x\n"
    got = _rows(spark, body)
    assert got == [("a", "disallow", ""), ("a", "disallow", "/x")]


# ------------------------------------------------------------- lookup


def _allowed(spark, body, paths, agent):
    from mashing_pumpkins_spark.sources.robots import parse_robots, robots_allowed

    robots = spark.createDataFrame([("h", body)], "host string, body string")
    frontier = spark.createDataFrame([("h", p) for p in paths], "host string, path string")
    out = robots_allowed(frontier, parse_robots(robots), agent)
    return {r["path"]: (r["allowed"], r["crawl_delay"]) for r in out.collect()}


def test_robots_allowed_longest_match_allow_wins_ties(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /shop\n"
        "Allow: /shop/sale\n"
        "Disallow: /shop/sale\n"   # same length as allow -> allow wins
    )
    got = _allowed(spark, body, ["/shop/x", "/shop/sale/item", "/other"], "anybot")
    assert got["/shop/x"] == (False, None)
    assert got["/shop/sale/item"] == (True, None)   # longer allow overrides
    assert got["/other"] == (True, None)


def test_robots_allowed_exact_section_overrides_wildcard(spark):
    body = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: trainbot\nDisallow: /no\nCrawl-delay: 4\n"
    )
    got_train = _allowed(spark, body, ["/ok", "/no/x"], "TrainBot")
    assert got_train["/ok"] == (True, "4")     # wildcard's Disallow:/ ignored
    assert got_train["/no/x"] == (False, "4")
    got_other = _allowed(spark, body, ["/ok"], "otherbot")
    assert got_other["/ok"] == (False, None)   # falls back to wildcard


def test_robots_allowed_no_rules_host_is_allowed(spark):
    from mashing_pumpkins_spark.sources.robots import parse_robots, robots_allowed

    robots = spark.createDataFrame([("h", "User-agent: *\nDisallow: /x\n")],
                                   "host string, body string")
    frontier = spark.createDataFrame([("unknown.com", "/anything")],
                                     "host string, path string")
    out = robots_allowed(frontier, parse_robots(robots), "bot").collect()
    assert out[0]["allowed"] is True and out[0]["crawl_delay"] is None


def test_parse_robots_sitemap_does_not_close_agent_group(spark):
    """RFC 9309: unknown directives are ignored — a Sitemap line between
    two User-agent headers must not split their shared group."""
    body = (
        "User-agent: a\n"
        "Sitemap: http://x/s.xml\n"
        "User-agent: b\n"
        "Disallow: /y\n"
    )
    got = _rows(spark, body)
    assert ("a", "disallow", "/y") in got
    assert ("b", "disallow", "/y") in got
    assert len(got) == 2


def test_robots_allowed_wildcard_and_end_anchor(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*?sessionid\n"     # '*' spans any chars
        "Disallow: /private$\n"        # '$' anchors: blocks /private only
        "Disallow: /a*b$\n"
    )
    got = _allowed(
        spark,
        body,
        [
            "/page?sessionid=1",     # matched by /*?sessionid
            "/page?other=1",
            "/private",              # exact -> blocked by $-anchored rule
            "/private/sub",          # NOT blocked ($ anchor)
            "/aXXb",                 # /a*b$ matches
            "/aXXbc",                # $ anchor rejects
        ],
        "anybot",
    )
    assert got["/page?sessionid=1"][0] is False
    assert got["/page?other=1"][0] is True
    assert got["/private"][0] is False
    assert got["/private/sub"][0] is True
    assert got["/aXXb"][0] is False
    assert got["/aXXbc"][0] is True


def test_robots_allowed_regex_metachars_are_literal(spark):
    body = "User-agent: *\nDisallow: /a.b(c)+\n"
    got = _allowed(spark, body, ["/a.b(c)+x", "/aXb(c)c"], "bot")
    assert got["/a.b(c)+x"][0] is False   # literal prefix match
    assert got["/aXb(c)c"][0] is True     # '.' and '+' are NOT regex here


def test_robots_crawl_delay_first_in_file_order(spark):
    body = "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 10\n"
    got = _allowed(spark, body, ["/x"], "bot")
    assert got["/x"][1] == "2"  # positional precedence, not string min


def test_robots_allowed_custom_host_col_and_value_collision(spark):
    """Regression (round-6 ADVICE): a non-default host_col must reach the
    frontier-to-rules join, and a frontier column literally named `value`
    must not collide with the rules table's value column."""
    from mashing_pumpkins_spark.sources.robots import parse_robots, robots_allowed

    robots = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /no\n")], "host string, body string"
    )
    frontier = spark.createDataFrame(
        [("h", "/no/x", "keep-me"), ("h", "/ok", "keep-me-too")],
        "site string, path string, value string",
    )
    out = robots_allowed(frontier, parse_robots(robots), "bot", host_col="site")
    got = {r["path"]: (r["allowed"], r["value"]) for r in out.collect()}
    assert got["/no/x"] == (False, "keep-me")
    assert got["/ok"] == (True, "keep-me-too")


def test_robots_specificity_is_octet_length(spark):
    """RFC 9309 longest-match counts OCTETS of the raw pattern. The
    discriminating case is equal CHAR length but unequal octet length:
    under char counting the rules tie (and allow would win the tie);
    under octet counting the multi-byte disallow is longer and wins."""
    path = "/a€"  # '€' is 3 UTF-8 bytes
    body = (
        "User-agent: *\n"
        "Disallow: /a€\n"  # 5 octets, 3 chars — matches path exactly
        "Allow: /a*\n"     # 3 octets, 3 chars — also matches via '*'
    )
    got = _allowed(spark, body, [path], "bot")
    assert got[path][0] is False
    # sanity: longer multi-byte ALLOW still overrides its disallow prefix
    body2 = (
        "User-agent: *\n"
        "Allow: /é€\n"   # 6 octets
        "Disallow: /é\n"  # 3 octets
    )
    p2 = "/é€x"
    got2 = _allowed(spark, body2, [p2], "bot")
    assert got2[p2][0] is True
