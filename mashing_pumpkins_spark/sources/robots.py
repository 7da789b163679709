"""robots.txt parsing — crawl-politeness bookkeeping for the ingest tier.

A Common-Crawl-style pipeline keeps a per-host rules table (which agent
may fetch which path prefixes, plus crawl-delay) joined against the
frontier before fetching. This parses raw robots.txt bodies into that
table in pure Column algebra — no Python in the hot path.

Section semantics (robotstxt.org): a `User-agent:` line opens a section;
consecutive user-agent lines share the following rules; `Allow:` /
`Disallow:` / `Crawl-delay:` lines belong to the most recent section.
The stateful "which section does this line belong to" scan is expressed
as a `last(ignorenulls)` running window per host ordered by line
position — robots bodies are tiny (a few KB), so the per-host window is
one executor-local sort however many hosts there are; the table itself
shuffles once on host.

Comment (#...) suffixes and surrounding whitespace are stripped;
directive names are case-insensitive; blank/unknown lines are ignored.
The multi-user-agent-header sharing rule is handled by keeping each
user-agent line's section OPEN until the next rule line: a rule joins
every agent declared since the last rule (standard group semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DIRECTIVE_RE = r"^\s*([A-Za-z-]+)\s*:\s*([^#]*?)\s*(?:#.*)?$"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, body) -> (host, agent, directive, value, rule_pos):
    one row per allow/disallow/crawl-delay rule per agent it applies to,
    `rule_pos` preserving file order (precedence is longest-match at
    lookup time; order matters for ties in some implementations).
    Agents are lowercased; directive is 'allow' | 'disallow' |
    'crawl-delay'; empty-value disallow lines (allow-all) are kept with
    value ''."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
    )
    parsed = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("directive"),
        F.regexp_extract("line", _DIRECTIVE_RE, 2).alias("value"),
    ).where(
        # unknown directives (Sitemap:, Host:, ...) are IGNORED entirely
        # (RFC 9309): they must not close an open user-agent group — a
        # 'User-agent: a / Sitemap: ... / User-agent: b' run still shares
        # the following rules between a and b
        F.col("directive").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    # group id: rule lines close the current agent group — a user-agent
    # line AFTER a rule line starts a new group. Count rule lines seen so
    # far; a user-agent line belongs to the group of rules that FOLLOW it,
    # so its group id is the count INCLUDING itself-forward.
    w = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    is_rule = (F.col("directive") != "user-agent").cast("int")
    grouped = parsed.withColumn(
        "grp", F.coalesce(F.sum(is_rule).over(w), F.lit(0))
    )
    agents = (
        grouped.where(F.col("directive") == "user-agent")
        .select(
            "host",
            # agents declared before a rule run share that run's group:
            # the first rule after the agents has grp == number of rules
            # before the agents, which equals each agent's own grp
            F.col("grp").alias("agrp"),
            F.lower(F.col("value")).alias("agent"),
        )
        .distinct()
    )
    rules = grouped.where(
        F.col("directive").isin("allow", "disallow", "crawl-delay")
    ).select(
        "host",
        F.col("grp").alias("rgrp"),
        "directive",
        "value",
        F.col("pos").alias("rule_pos"),
    )
    # a rule with k prior rules in its run belongs to the agent group that
    # opened at the run start: agents' grp == index of the run's FIRST
    # rule. Map each rule to its run-start rule count: run_start = grp
    # minus (consecutive rule lines immediately before it in the same
    # run). Equivalently: the latest agent group at-or-before this rule.
    joined = rules.join(
        agents,
        (rules["host"] == agents["host"]) & (agents["agrp"] <= rules["rgrp"]),
    )
    best = (
        joined.withColumn(
            "maxg",
            F.max("agrp").over(Window.partitionBy(rules["host"], "rule_pos")),
        )
        .where(F.col("agrp") == F.col("maxg"))
        .select(rules["host"], "agent", "directive", "value", "rule_pos")
    )
    return best.orderBy("host", "rule_pos", "agent")


def _rule_regex(value: Column) -> Column:
    """RFC 9309 rule pattern -> anchored Java regex: '*' matches any
    char run, a TRAILING '$' anchors at end of path, every other regex
    metacharacter is literal."""
    esc = F.regexp_replace(value, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    wild = F.replace(esc, F.lit("*"), F.lit(".*"))
    # a trailing '$' in the ORIGINAL value was escaped to '\$' above;
    # restore it as an end anchor
    anchored = value.endswith("$")
    body = F.when(
        anchored,
        F.concat(wild.substr(F.lit(1), F.length(wild) - 2), F.lit("$")),
    ).otherwise(wild)
    return F.concat(F.lit("^"), body)


def robots_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Frontier (host, path) -> same + `allowed` boolean + `crawl_delay`
    (string, null when unset) for `agent`, per RFC 9309 precedence: the
    most specific matching user-agent section wins (exact agent name
    beats '*'; no section at all -> allowed); within it, the
    longest-pattern matching rule decides ('*' matches any char run, a
    trailing '$' anchors at path end, specificity = octet length of the
    raw pattern), allow winning length ties; empty-value rules match
    nothing; no matching rule -> allowed. crawl_delay is the section's
    FIRST crawl-delay line in file order (positional precedence),
    returned as its raw string.

    Scale shape: the rules table is per-host KB-sized — broadcast it;
    one broadcast join on host, one (host, path)-keyed aggregation with
    a max(struct) winner (map-side combinable), no window over paths.

    Rules-side columns are renamed to a `_mp_r` prefix before touching the
    frontier, so a frontier that itself carries `value`/`directive`
    columns (or a non-default host_col) joins cleanly."""
    a = agent.lower()
    r = rules.where(F.col("agent").isin(a, "*"))
    # best available section per host: exact beats wildcard
    sect = r.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("has_exact")
    )
    r_sel = r.join(F.broadcast(sect), "host").where(
        (F.col("agent") == a)
        == (F.col("has_exact") == 1)  # exact rules iff exact section exists
    )
    delays = r_sel.where(F.col("directive") == "crawl-delay").groupBy(
        F.col("host").alias("_mp_rhost")
    ).agg(F.expr("min_by(value, rule_pos)").alias("crawl_delay"))
    paths = r_sel.where(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        F.col("host").alias("_mp_rhost"),
        F.col("directive").alias("_mp_rdir"),
        F.col("value").alias("_mp_rval"),
        _rule_regex(F.col("value")).alias("_mp_rvre"),
    )
    cand = frontier.join(
        F.broadcast(paths), frontier[host_col] == paths["_mp_rhost"], "left"
    ).where(
        F.col("_mp_rval").isNull()
        | F.expr(f"`{path_col}` rlike _mp_rvre")
    )
    win = cand.groupBy(frontier[host_col], frontier[path_col]).agg(
        F.max(
            F.when(
                F.col("_mp_rval").isNotNull(),
                F.struct(
                    # RFC 9309 specificity is OCTET length of the raw
                    # pattern — multi-byte UTF-8 rules count bytes, not
                    # chars, so tie-breaks match spec-conformant parsers
                    F.octet_length("_mp_rval").alias("l"),
                    (F.col("_mp_rdir") == "allow").cast("int").alias("a"),
                ),
            )
        ).alias("best")
    )
    return (
        frontier.join(win, [host_col, path_col], "left")
        .join(
            F.broadcast(delays),
            F.col(host_col) == F.col("_mp_rhost"),
            "left",
        )
        .select(
            frontier["*"],
            (
                F.col("best").isNull() | (F.col("best.a") == 1)
            ).alias("allowed"),
            "crawl_delay",
        )
    )
