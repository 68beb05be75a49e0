"""robots.txt parsing and URL crawl verdicts, all JVM-side.

The crawl-policy companion to the robots-META gate (urlnorm.py
parses in-page ``<meta name="robots">``; THIS parses the per-host
``/robots.txt`` file a crawler fetches first). Reference analog: the
pre-flight validity gates the reference applies before spending model
time on an image (``check_img``/format dispatch,
ppocr/utils/utility.py:60-124) — here the gate is the host's declared
policy instead of file magic.

Parsing follows the robots.txt de-facto standard (RFC 9309):

- a STANZA is a run of ``User-agent:`` lines followed by its rules; a
  later ``User-agent:`` line directly after rules opens a NEW stanza
  (gaps-and-islands over the line stream — the same windowing shape
  as span_dedup's island merge);
- only stanzas naming agent ``*`` apply (single-agent simplification,
  documented — a per-agent variant is the same join with one more
  key);
- ``Allow``/``Disallow`` values are path patterns supporting the two
  RFC 9309 §2.2.3 metacharacters — ``*`` (any octet run) and a
  trailing ``$`` (end-of-path anchor); everything else matches as a
  literal prefix. The verdict for a URL is decided by the LONGEST
  matching rule (by raw rule-text length, the de-facto "most
  specific" order), ``Allow`` winning ties; an empty ``Disallow:``
  matches nothing; comments (``#``) and blank lines are stripped.
- line framing is tolerant: LF, CRLF and bare-CR files all parse
  (split on any of the three), and field values are stripped of ALL
  whitespace (tabs included), not just spaces.

Scale shape: robots files are one tiny row per HOST (millions of
rows at web scale, ~KBs each — nothing next to the page corpus), so
the parsed rule table broadcasts; the verdict is a broadcast
equi-join on host + a per-URL window over a handful of candidate
rules. The page corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webextract.operators.links import host_of


def _ws_strip(col):
    """Strip leading/trailing WHITESPACE (tabs, CR included) — Spark's
    ``F.trim`` removes only ASCII space, so a CRLF-framed robots.txt
    would otherwise keep '\\r' glued to every field value."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _robots_lines(robots: DataFrame, body_col: str) -> DataFrame:
    """(host, ln, line): the shared robots.txt line pipeline — split on
    any of LF/CRLF/CR, strip comments ('#' to end of line) and
    surrounding whitespace. BOTH consumers (the stanza walk and the
    global Sitemap: scan) read this, so framing fixes land once."""
    return robots.select(
        "host",
        F.posexplode(
            F.split(F.decode(F.col(body_col), "UTF-8"), "\r\n|\r|\n")
        ).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        _ws_strip(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )


def _stanzas(robots: DataFrame, body_col: str) -> tuple[DataFrame, DataFrame]:
    """Shared stanza machinery: → (st, star) where ``st`` is every
    non-empty line tagged (host, ln, line, is_ua, val, low, stanza)
    and ``star`` is the (host, stanza) set whose agent lines include
    ``*``. Stanza tracking is gaps-and-islands: a user-agent line
    whose PREVIOUS line is not a user-agent line starts a new stanza
    (so stacked ``User-agent: a`` / ``User-agent: *`` share one
    stanza)."""
    lines = _robots_lines(robots, body_col)
    low = F.lower(F.col("line"))
    is_ua = low.startswith("user-agent:")
    # value = everything after the FIRST colon (paths may contain ':')
    after = _ws_strip(F.regexp_extract(F.col("line"), "^[^:]*:(.*)$", 1))
    w = Window.partitionBy("host").orderBy("ln")
    tagged = lines.filter(F.col("line") != "").select(
        "host",
        "ln",
        "line",
        is_ua.alias("is_ua"),
        after.alias("val"),
        low.alias("low"),
    )
    stanza = F.sum(
        (
            F.col("is_ua")
            & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
        ).cast("int")
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    st = tagged.withColumn("stanza", stanza)
    star = (
        st.filter(F.col("is_ua") & (F.col("val") == "*"))
        .select("host", "stanza")
        .distinct()
    )
    return st, star


def parse_robots(robots: DataFrame, body_col: str = "body") -> DataFrame:
    """robots(host, body:binary) → (host, verb, path): the Allow /
    Disallow rules of every ``User-agent: *`` stanza (stanza
    semantics: :func:`_stanzas`)."""
    st, star = _stanzas(robots, body_col)
    rules = st.filter(
        F.col("low").startswith("disallow:") | F.col("low").startswith("allow:")
    ).select(
        "host",
        "stanza",
        F.when(F.col("low").startswith("allow:"), F.lit("allow"))
        .otherwise(F.lit("disallow"))
        .alias("verb"),
        F.col("val").alias("path"),
    )
    # empty Disallow: matches nothing (the classic "allow everything")
    return (
        rules.join(star, ["host", "stanza"])
        .filter(F.col("path") != "")
        .select("host", "verb", "path")
    )


def crawl_delays(robots: DataFrame, body_col: str = "body") -> DataFrame:
    """robots(host, body:binary) → (host, crawl_delay_s): the
    ``Crawl-delay:`` of every host's ``User-agent: *`` stanza — the
    de-facto politeness field (not in RFC 9309 but honored by most
    crawlers), consumed by the fetch scheduler as seconds between a
    host's politeness waves.

    Frozen semantics: integer seconds only, at most 18 significant
    digits with leading zeros tolerated (a non-numeric, fractional,
    or absurdly long value is ignored — the conservative read is the
    caller's default, and the digit bound keeps an adversarial
    robots.txt from overflowing the BIGINT cast, which raises under
    ANSI mode instead of ignoring); when several
    ``*`` stanzas declare one, the FIRST in file order wins; a delay
    in a non-``*`` stanza (e.g. a googlebot-only block) never
    applies. Hosts without a valid declaration are simply absent —
    the scheduler's default covers them.
    """
    st, star = _stanzas(robots, body_col)
    w = Window.partitionBy("host").orderBy("ln")
    return (
        st.filter(
            F.col("low").startswith("crawl-delay:")
            & F.col("val").rlike("^0*[0-9]{1,18}$")
        )
        .join(star, ["host", "stanza"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("host", F.col("val").cast("long").alias("crawl_delay_s"))
    )


def robots_verdict(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, blocked, rule_verb, rule_path): every page judged against
    the parsed rule table — longest matching rule wins, ``allow``
    beats ``disallow`` on equal length (RFC 9309 §2.4.2), no matching
    rule means allowed. Rules honor the two §2.2.3 metacharacters:
    ``*`` matches any octet run and a trailing ``$`` anchors at
    end-of-target; wildcard-free rules take the cheap ``startswith``
    path (no regex evaluated for the common case).

    The match target is the URL's path PLUS its ``?query`` when one is
    present (RFC 9309 §2.2.2 matches against path and query together;
    the ``#fragment`` is excluded) — so the common real-world rule
    ``Disallow: /*?sessionid=`` actually blocks session-id URLs
    instead of silently never matching anything.

    The rule table is collapsed to ONE array-of-rules row per host
    (with each rule's match regex precomputed on that tiny side) and
    broadcast; every page then left-joins its host's rule array and
    picks the winner with array filter + sort — one row per page end
    to end, so the corpus is scanned ONCE and never shuffled (the only
    shuffle is the per-host groupBy of the KB-sized rule table).
    Deterministic tie-break: length desc, verb asc ('allow' <
    'disallow'), path asc.
    """
    path = F.regexp_extract(F.col("url"), r"^https?://[^/?#]+(/[^?#]*)?", 1)
    query = F.regexp_extract(F.col("url"), r"^https?://[^?#]*(\?[^#]*)", 1)
    target = pages.select(
        "url",
        host_of(F.col("url")).alias("host"),
        F.concat(F.when(path == "", "/").otherwise(path), query).alias(
            "path_t"
        ),
    )
    # translate each rule path to a regex on the TINY rules side:
    # strip a trailing '$' (anchor), escape regex metachars, '*'→'.*'
    anchored = F.col("path").endswith("$")
    base = F.when(
        anchored, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.regexp_replace(base, r"([.^$+?(){}\[\]|\\])", "\\\\$1")
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    has_wild = F.col("path").contains("*") | anchored
    by_host = (
        rules.select(
            "host", "verb", "path", has_wild.alias("wild"), rx.alias("rx")
        )
        .groupBy("host")
        .agg(F.collect_list(F.struct("verb", "path", "wild", "rx")).alias("rules"))
    )

    def _matches(r):
        return F.when(
            r["wild"], F.regexp_like(F.col("path_t"), r["rx"])
        ).otherwise(F.col("path_t").startswith(r["path"]))

    def _better(a, b):
        # -1 iff a is the MORE specific rule: length desc, verb asc
        # ('allow' < 'disallow'), path asc
        return (
            F.when(F.length(a["path"]) > F.length(b["path"]), F.lit(-1))
            .when(F.length(a["path"]) < F.length(b["path"]), F.lit(1))
            .when(a["verb"] < b["verb"], F.lit(-1))
            .when(a["verb"] > b["verb"], F.lit(1))
            .when(a["path"] < b["path"], F.lit(-1))
            .when(a["path"] > b["path"], F.lit(1))
            .otherwise(F.lit(0))
        )

    win = F.get(
        F.array_sort(
            F.filter(F.coalesce(F.col("rules"), F.array()), _matches), _better
        ),
        0,
    )
    return (
        target.join(F.broadcast(by_host), "host", "left")
        .withColumn("win", win)
        .select(
            "url",
            F.coalesce(F.col("win.verb") == "disallow", F.lit(False)).alias(
                "blocked"
            ),
            F.col("win.verb").alias("rule_verb"),
            F.col("win.path").alias("rule_path"),
        )
    )


def sitemap_urls(robots: DataFrame, body_col: str = "body") -> DataFrame:
    """robots(host, body) → (host, sitemap_url): the ``Sitemap:``
    directives — per RFC 9309 §2.3 they live OUTSIDE user-agent
    stanzas and apply globally, so this is a line filter, not a
    stanza walk. The output feeds sitemap.parse_sitemap /
    parse_sitemap_index: robots.txt names the sitemaps, the sitemaps
    name the urls, the frontier ranks them. Values keep their case
    (urls are case-sensitive; only the field name is folded)."""
    lines = _robots_lines(robots, body_col)
    val = _ws_strip(F.regexp_extract(F.col("line"), "^[^:]*:(.*)$", 1))
    return (
        lines.filter(F.lower(F.col("line")).startswith("sitemap:"))
        .select("host", val.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )
