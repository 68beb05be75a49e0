"""robots.txt parsing + verdicts (operators/robots.py)."""

from pyspark.sql import Row

from webextract.operators.robots import parse_robots, robots_verdict


def _robots(spark, host_bodies):
    return spark.createDataFrame(
        [Row(host=h, body=b.encode()) for h, b in host_bodies.items()]
    )


def _rules(spark, host_bodies):
    return {
        (r["host"], r["verb"], r["path"])
        for r in parse_robots(_robots(spark, host_bodies)).collect()
    }


def test_parse_only_star_stanzas_apply(spark):
    body = (
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    )
    assert _rules(spark, {"h": body}) == {
        ("h", "disallow", "/a"),
        ("h", "allow", "/a/b"),
    }


def test_parse_stacked_agents_share_stanza(spark):
    body = "User-agent: bot\nUser-agent: *\nDisallow: /x\n"
    assert _rules(spark, {"h": body}) == {("h", "disallow", "/x")}


def test_parse_new_stanza_resets_agents(spark):
    # rules separate the two user-agent lines → two stanzas, only the
    # second is '*'; the first stanza's rule must not leak into it
    body = "User-agent: bot\nDisallow: /x\nUser-agent: *\nDisallow: /y\n"
    assert _rules(spark, {"h": body}) == {("h", "disallow", "/y")}


def test_parse_strips_comments_blanks_and_empty_disallow(spark):
    body = (
        "# top comment\n\nUser-agent: *  # star\n"
        "Disallow:\n"                      # empty → matches nothing
        "Disallow: /real  # trailing\n\n"
    )
    assert _rules(spark, {"h": body}) == {("h", "disallow", "/real")}


def test_parse_value_may_contain_colon(spark):
    body = "User-agent: *\nDisallow: /a:b\n"
    assert _rules(spark, {"h": body}) == {("h", "disallow", "/a:b")}


def test_verdict_longest_match_and_allow_tiebreak(spark):
    rules = spark.createDataFrame(
        [
            Row(host="h.ex", verb="disallow", path="/a"),
            Row(host="h.ex", verb="allow", path="/a/b"),
            Row(host="h.ex", verb="allow", path="/c"),
            Row(host="h.ex", verb="disallow", path="/c"),  # tie → allow
        ]
    )
    pages = spark.createDataFrame(
        [
            Row(url="https://h.ex/a/x"),      # blocked by /a
            Row(url="https://h.ex/a/b/x"),    # allowed: longer /a/b
            Row(url="https://h.ex/c"),        # tie at len 2 → allow
            Row(url="https://h.ex/free"),     # no rule
            Row(url="https://other.ex/a/x"),  # unknown host → allowed
        ]
    )
    out = {r["url"]: r for r in robots_verdict(pages, rules).collect()}
    assert out["https://h.ex/a/x"]["blocked"]
    assert out["https://h.ex/a/x"]["rule_path"] == "/a"
    assert not out["https://h.ex/a/b/x"]["blocked"]
    assert out["https://h.ex/a/b/x"]["rule_path"] == "/a/b"
    assert not out["https://h.ex/c"]["blocked"]
    assert out["https://h.ex/c"]["rule_verb"] == "allow"
    assert not out["https://h.ex/free"]["blocked"]
    assert out["https://h.ex/free"]["rule_verb"] is None
    assert not out["https://other.ex/a/x"]["blocked"]


def test_verdict_pathless_url_is_root(spark):
    rules = spark.createDataFrame([Row(host="h.ex", verb="disallow", path="/")])
    pages = spark.createDataFrame([Row(url="https://h.ex")])
    assert robots_verdict(pages, rules).first()["blocked"]


def test_parse_crlf_and_tab_framing(spark):
    # the common real-world framing: CRLF line endings, tab after the
    # colon — '\r'/'\t' must not survive into agent or path values
    body = "User-agent:\t*\r\nDisallow:\t/private\r\nAllow: /private/ok\r\n"
    assert _rules(spark, {"h": body}) == {
        ("h", "disallow", "/private"),
        ("h", "allow", "/private/ok"),
    }


def test_parse_bare_cr_framing(spark):
    body = "User-agent: *\rDisallow: /x\r"
    assert _rules(spark, {"h": body}) == {("h", "disallow", "/x")}


def test_verdict_wildcard_star_and_end_anchor(spark):
    rules = spark.createDataFrame(
        [
            Row(host="h.ex", verb="disallow", path="/*.pdf$"),
            Row(host="h.ex", verb="disallow", path="/tmp/*"),
            Row(host="h.ex", verb="allow", path="/tmp/keep"),
        ]
    )
    pages = spark.createDataFrame(
        [
            Row(url="https://h.ex/docs/a.pdf"),     # *.pdf$ → blocked
            Row(url="https://h.ex/docs/a.pdfx"),    # $ anchor → allowed
            Row(url="https://h.ex/tmp/zzz"),        # /tmp/* → blocked
            Row(url="https://h.ex/tmp/keep/f"),     # longer allow wins
        ]
    )
    out = {r["url"]: r for r in robots_verdict(pages, rules).collect()}
    assert out["https://h.ex/docs/a.pdf"]["blocked"]
    assert out["https://h.ex/docs/a.pdf"]["rule_path"] == "/*.pdf$"
    assert not out["https://h.ex/docs/a.pdfx"]["blocked"]
    assert out["https://h.ex/tmp/zzz"]["blocked"]
    assert not out["https://h.ex/tmp/keep/f"]["blocked"]


def test_verdict_matches_path_plus_query(spark):
    # RFC 9309 §2.2.2: the match target is path AND query (fragment
    # excluded) — 'Disallow: /*?sessionid=' must block session URLs
    rules = spark.createDataFrame(
        [
            Row(host="h.ex", verb="disallow", path="/*?sessionid="),
            Row(host="h.ex", verb="disallow", path="/search?q=x$"),
        ]
    )
    pages = spark.createDataFrame(
        [
            Row(url="https://h.ex/cart?sessionid=abc"),     # blocked
            Row(url="https://h.ex/cart"),                   # no query
            Row(url="https://h.ex/search?q=x"),             # $ anchor hit
            Row(url="https://h.ex/search?q=xy"),            # past anchor
            Row(url="https://h.ex/a?sessionid=1#frag"),     # frag excluded
            Row(url="https://h.ex?sessionid=1"),            # pathless+query
        ]
    )
    out = {r["url"]: r for r in robots_verdict(pages, rules).collect()}
    assert out["https://h.ex/cart?sessionid=abc"]["blocked"]
    assert out["https://h.ex/cart?sessionid=abc"]["rule_path"] == "/*?sessionid="
    assert not out["https://h.ex/cart"]["blocked"]
    assert out["https://h.ex/search?q=x"]["blocked"]
    assert not out["https://h.ex/search?q=xy"]["blocked"]
    assert out["https://h.ex/a?sessionid=1#frag"]["blocked"]
    assert out["https://h.ex?sessionid=1"]["blocked"]


def test_verdict_regex_metachars_are_literal(spark):
    # '.', '(', '+' in a rule path must match literally, not as regex
    rules = spark.createDataFrame(
        [Row(host="h.ex", verb="disallow", path="/a.b(c)+*")]
    )
    pages = spark.createDataFrame(
        [
            Row(url="https://h.ex/a.b(c)+x"),  # literal prefix → blocked
            Row(url="https://h.ex/aXb(c)+x"),  # '.' is literal → allowed
        ]
    )
    out = {r["url"]: r for r in robots_verdict(pages, rules).collect()}
    assert out["https://h.ex/a.b(c)+x"]["blocked"]
    assert not out["https://h.ex/aXb(c)+x"]["blocked"]


def test_sitemap_urls_global_case_preserving(spark):
    from webextract.operators.robots import sitemap_urls

    body = (
        b"# policy\n"
        b"Sitemap: https://h.example/SiteMap.xml\n"
        b"User-agent: *\r\n"
        b"Disallow: /private\r\n"
        b"sitemap:\thttps://h.example/s2.xml  \n"
        b"Sitemap:\n"  # empty value dropped
    )
    df = spark.createDataFrame([("h.example", body)], "host string, body binary")
    got = sorted(r.sitemap_url for r in sitemap_urls(df).collect())
    # case of the URL preserved, field name case-insensitive, CRLF ok
    assert got == ["https://h.example/SiteMap.xml", "https://h.example/s2.xml"]


def _delays(spark, host_bodies):
    from webextract.operators.robots import crawl_delays

    return {
        r["host"]: r["crawl_delay_s"]
        for r in crawl_delays(_robots(spark, host_bodies)).collect()
    }


def test_crawl_delay_star_stanza_only(spark):
    body = (
        "User-agent: googlebot\nCrawl-delay: 99\n\n"
        "User-agent: *\nDisallow: /x\nCrawl-delay: 4\n"
    )
    assert _delays(spark, {"h": body}) == {"h": 4}


def test_crawl_delay_first_star_declaration_wins(spark):
    body = (
        "User-agent: *\nCrawl-delay: 3\n\n"
        "User-agent: *\nCrawl-delay: 8\n"
    )
    assert _delays(spark, {"h": body}) == {"h": 3}


def test_crawl_delay_non_numeric_and_absent_ignored(spark):
    bodies = {
        "frac": "User-agent: *\nCrawl-delay: 2.5\n",   # fractional → ignored
        "text": "User-agent: *\nCrawl-delay: fast\n",
        "none": "User-agent: *\nDisallow: /x\n",
        "ok": "User-agent: *\nCRAWL-DELAY: 6\n",       # case-insensitive field
    }
    assert _delays(spark, bodies) == {"ok": 6}


def test_crawl_delay_overflow_is_ignored_not_fatal(spark):
    # 20 digits passes a naive numeric regex but overflows BIGINT —
    # under ANSI mode a plain cast would fail the whole job
    body = "User-agent: *\nCrawl-delay: 99999999999999999999\n"
    assert _delays(spark, {"h": body}) == {}


def test_crawl_delay_leading_zeros_still_parse(spark):
    # 19+ chars but castable: leading zeros must not trip the
    # overflow bound
    body = "User-agent: *\nCrawl-delay: 0000000000000000005\n"
    assert _delays(spark, {"h": body}) == {"h": 5}
