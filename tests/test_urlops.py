"""URL canonicalization invariants beyond oracle parity."""

from pyspark.sql import functions as F

from ocr_application_spark.operators.urlops import canonical_url

CASES = [
    # (raw, expected)
    ("https://a.example/x", "https://a.example/x"),
    ("HTTPS://WWW.A.Example:443/x#frag", "https://a.example/x"),
    ("https://a.example/x?utm_source=f&b=2&a=1", "https://a.example/x?a=1&b=2"),
    ("https://a.example/x?utm_source=f", "https://a.example/x"),
    ("http://a.example/", "http://a.example/"),
    ("https://a.example", "https://a.example"),          # path-less
    ("https://a.example/CaseSensitive/Path", "https://a.example/CaseSensitive/Path"),
    ("https://www.a.example/x?z=1&y=2&utm_medium=m#s", "https://a.example/x?y=2&z=1"),
    # fragment-embedded '?' must not leak into the query (SPA routes)
    ("https://h.example/p#/route?tab=1", "https://h.example/p"),
    # default port is scheme-specific
    ("http://h.example:80/p", "http://h.example/p"),
    ("http://h.example:443/p", "http://h.example:443/p"),  # NOT default for http
    ("https://h.example:80/p", "https://h.example:80/p"),  # NOT default for https
    # non-hierarchical / junk urls pass through as their own identity
    ("mailto:alice@example.com", "mailto:alice@example.com"),
    ("javascript:void(0)", "javascript:void(0)"),
    ("/relative/path", "/relative/path"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "u string")
    got = [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [e for _, e in CASES]


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u): canonical output contains nothing
    left for a second pass to strip — the property that makes it safe to
    apply at every ingest point without tracking 'already canonical'."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "u string")
    two = df.select(
        canonical_url(F.col("u")).alias("c1"),
        canonical_url(canonical_url(F.col("u"))).alias("c2"),
    )
    assert all(r.c1 == r.c2 for r in two.collect())


def test_crawl_schedule_rate_law_and_determinism(spark):
    """No host exceeds rate_per_tick per tick, every url is scheduled
    exactly once, the per-host schedule is dense (ticks 0..ceil(n/r)-1),
    higher priority never fetches later than lower within a host, and
    validation rejects bad rates."""
    import pytest as _pytest

    from ocr_application_spark.operators.urlops import crawl_schedule

    rows = [
        (f"https://{h}/p{i}", h, (i * 7) % 5)
        for h in ("a", "b", "c")
        for i in range({"a": 7, "b": 1, "c": 3}[h])
    ]
    df = spark.createDataFrame(rows, "url string, host string, priority long")
    got = crawl_schedule(
        df, priority_col="priority", rate_per_tick=2, t0_us=100, tick_us=10
    ).collect()
    assert len(got) == len(rows) and len({r.url for r in got}) == len(rows)
    from collections import Counter

    per_tick = Counter((r.host, r.tick_idx) for r in got)
    assert max(per_tick.values()) <= 2
    for h, n in (("a", 7), ("b", 1), ("c", 3)):
        ticks = sorted(r.tick_idx for r in got if r.host == h)
        want_len = -(-n // 2)
        assert set(ticks) == set(range(want_len))
    for h in ("a", "b", "c"):
        hs = sorted((r for r in got if r.host == h), key=lambda r: r.fetch_rank)
        pris = [r.priority for r in hs]
        assert pris == sorted(pris, reverse=True) or all(
            pris[i] >= pris[i + 1] for i in range(len(pris) - 1)
        )
        assert all(r.scheduled_us == 100 + r.tick_idx * 10 for r in hs)
    with _pytest.raises(ValueError, match="rate_per_tick"):
        crawl_schedule(df, rate_per_tick=0)
    with _pytest.raises(ValueError, match="tick_us"):
        crawl_schedule(df, tick_us=0)


def test_robots_filter_rfc9309_semantics(spark):
    """Longest prefix wins; allow beats disallow on equal length; no
    matching rule (or no rules for the host at all) means allowed; a
    whole-host '/' ban is overridden by any longer allow."""
    from ocr_application_spark.operators.urlops import robots_filter

    rules = spark.createDataFrame(
        [
            ("h", "/private/", False),
            ("h", "/private/pub/", True),
            ("g", "/", False),
            ("g", "/open/", True),
            ("t", "/x/", True),
            ("t", "/x/", False),  # equal-length conflict: allow wins
        ],
        ["host", "prefix", "allow"],
    )
    frontier = spark.createDataFrame(
        [
            ("h", "/private/secret"),
            ("h", "/private/pub/ok"),
            ("h", "/elsewhere"),
            ("g", "/anything"),
            ("g", "/open/page"),
            ("t", "/x/tie"),
            ("z", "/nohost"),
        ],
        ["host", "path"],
    )
    out = {
        (r.host, r.path): (r.allowed, r.matched_prefix)
        for r in robots_filter(frontier, rules).collect()
    }
    assert out[("h", "/private/secret")] == (False, "/private/")
    assert out[("h", "/private/pub/ok")] == (True, "/private/pub/")
    assert out[("h", "/elsewhere")] == (True, None)
    assert out[("g", "/anything")] == (False, "/")
    assert out[("g", "/open/page")] == (True, "/open/")
    assert out[("t", "/x/tie")] == (True, "/x/")
    assert out[("z", "/nohost")] == (True, None)
    assert len(out) == 7


def test_robots_filter_rfc9309_wildcards(spark):
    """RFC 9309 '*' / '$' semantics: '*' spans any run of octets, a
    TRAILING '$' anchors the end of the path, specificity is the
    pattern's octet length ('*' and '$' count), and regex metachars in
    real-world rule text must be matched literally."""
    from ocr_application_spark.operators.urlops import robots_filter

    rules = spark.createDataFrame(
        [
            ("w", "/*?sessionid=", False),  # the canonical live wildcard rule
            ("w", "/img/", False),
            ("w", "/img/*.png$", True),  # len 11 beats /img/ (5)
            ("w", "/exact$", False),  # end-anchored exact path
            ("w", "/a(b)+c/", False),  # metachars stay literal
            ("w", "/dl/*.pdf", False),  # wildcard, NOT anchored
        ],
        ["host", "prefix", "allow"],
    )
    frontier = spark.createDataFrame(
        [
            ("w", "/page?sessionid=abc"),  # '*' spans mid-path
            ("w", "/img/photo.png"),  # anchored allow wins over /img/ ban
            ("w", "/img/photo.png?x=1"),  # $ must NOT match -> /img/ ban
            ("w", "/exact"),  # $ matches the exact path
            ("w", "/exact/sub"),  # longer than the anchor -> no match
            ("w", "/a(b)+c/d"),  # literal parens/plus
            ("w", "/abbc/d"),  # would match only if '+' were regex
            ("w", "/dl/file.pdf.tmp"),  # unanchored wildcard still matches
        ],
        ["host", "path"],
    )
    out = {
        r.path: (r.allowed, r.matched_prefix)
        for r in robots_filter(frontier, rules).collect()
    }
    assert out["/page?sessionid=abc"] == (False, "/*?sessionid=")
    assert out["/img/photo.png"] == (True, "/img/*.png$")
    assert out["/img/photo.png?x=1"] == (False, "/img/")
    assert out["/exact"] == (False, "/exact$")
    assert out["/exact/sub"] == (True, None)
    assert out["/a(b)+c/d"] == (False, "/a(b)+c/")
    assert out["/abbc/d"] == (True, None)
    assert out["/dl/file.pdf.tmp"] == (False, "/dl/*.pdf")
    assert len(out) == 8


def test_robots_parse_grammar_edges(spark):
    """Parser paths the roundtrip fixture can't isolate: rules BEFORE
    any user-agent line are ignored (RFC: rules outside a group bind to
    nothing), UA token matching folds case on BOTH sides, a later
    same-agent group merges with the earlier one, and a file whose only
    groups don't match (and no '*') yields zero rules."""
    import pytest as _pytest

    from ocr_application_spark.operators.urlops import robots_parse

    txt = (
        "Disallow: /orphan/\r\n"  # before any group: ignored
        "User-agent: SPARKBOT\r\n"  # uppercase token must still match
        "Disallow: /a/\r\n"
        "User-agent: Sparkbot\r\n"  # same agent again: groups merge
        "Allow: /a/b/\r\n"
    )
    df = spark.createDataFrame([(1, txt)], ["host_id", "robots_txt"])
    rules = {
        (r.prefix, r.allow) for r in robots_parse(df, "sparkbot").collect()
    }
    assert rules == {("/a/", False), ("/a/b/", True)}

    nomatch = "User-agent: otherbot\r\nDisallow: /\r\n"
    df2 = spark.createDataFrame([(1, nomatch)], ["host_id", "robots_txt"])
    assert robots_parse(df2, "sparkbot").count() == 0

    with _pytest.raises(ValueError, match="lowercase"):
        robots_parse(df, "SparkBot")


def test_robots_parse_feeds_robots_filter(spark):
    """End-to-end REP gate: raw robots.txt bytes -> robots_parse ->
    robots_filter, wildcards included — the two halves compose on the
    (host, prefix, allow) contract."""
    from ocr_application_spark.operators.urlops import robots_filter, robots_parse

    txt = (
        "User-agent: *\r\n"
        "Disallow: /private/\r\n"
        "\r\n"
        "User-agent: sparkbot\r\n"
        "Disallow: /*?sessionid=\r\n"
        "Allow: /private/pub/\r\n"
        "Disallow: /private/\r\n"
    )
    robots = spark.createDataFrame([("h", txt)], ["host", "robots_txt"])
    rules = robots_parse(robots, "sparkbot", host_col="host").select(
        "host", "prefix", "allow"
    )
    frontier = spark.createDataFrame(
        [
            ("h", "/private/x"),
            ("h", "/private/pub/ok"),
            ("h", "/page?sessionid=1"),
            ("h", "/open"),
        ],
        ["host", "path"],
    )
    out = {
        r.path: r.allowed for r in robots_filter(frontier, rules).collect()
    }
    # the sparkbot group won (specificity 8 > '*'), so its allow/deny
    # card applies — including the wildcard ban
    assert out == {
        "/private/x": False,
        "/private/pub/ok": True,
        "/page?sessionid=1": False,
        "/open": True,
    }


# --- SURT keys + the CDX index ------------------------------------------------

SURT_CASES = [
    ("https://blog.example.com/a/B?x=1", "com,example,blog)/a/B?x=1"),
    ("https://example.org", "org,example)/"),
    ("https://h.example:8080/p", "example,h:8080)/p"),
    ("http://one.two.three.net/d", "net,three,two,one)/d"),
    ("mailto:alice@example.com", "mailto:alice@example.com"),  # passthrough
    ("/relative/path", "/relative/path"),
]


def test_surt_key_cases(spark):
    from ocr_application_spark.operators.urlops import surt_key

    df = spark.createDataFrame([(r,) for r, _ in SURT_CASES], "u string")
    got = [r.k for r in df.select(surt_key(F.col("u")).alias("k")).collect()]
    assert got == [e for _, e in SURT_CASES]


def test_surt_pack64_is_order_preserving(spark):
    """For ASCII keys, pack order == string (byte) order whenever the
    first 8 bytes differ; equal-prefix keys pack equal (the residual's
    job). Short keys sort before every extension."""
    from ocr_application_spark.operators.urlops import surt_pack64

    keys = sorted(
        [
            "com,example)/",
            "com,example)/a",
            "com,example,blog)/post",
            "com,exbmple)/",
            "net)/",
            "org,sample)/p?q=1",
            "org,sample)/p?q=2",  # same first 8 bytes as above
            "a",
            "",
            "z" * 20,
        ]
    )
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    packed = {
        r.k: r.p
        for r in df.select("k", surt_pack64(F.col("k")).alias("p")).collect()
    }
    vals = [packed[k] for k in keys]  # keys already string-sorted
    assert vals == sorted(vals), vals
    for a, b in zip(keys, keys[1:]):
        if a[:8] != b[:8]:
            assert packed[a] < packed[b], (a, b)
        else:
            assert packed[a] == packed[b], (a, b)


def test_surt_pack64_non_ascii_never_overflows(spark):
    """A key whose FIRST character has codepoint >= 128 (an IRI that
    surt_key passed through unchanged) must pack to a valid int64 —
    clamped coarse, never an ANSI ArithmeticException — and clamping
    must stay monotone against ASCII neighbours."""
    from ocr_application_spark.operators.urlops import surt_pack64

    keys = ["~tilde)/", "Ürl-iri", "ドメイン,例)/", "\x7f", "ascii)/"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    packed = {
        r.k: r.p
        for r in df.select("k", surt_pack64(F.col("k")).alias("p")).collect()
    }
    assert all(0 <= v <= 2**63 - 1 for v in packed.values())
    # every >=128 first byte clamps to 127 (DEL): above all lower ASCII
    # starts — coarse (ties possible) but never order-inverted
    assert packed["ascii)/"] < packed["~tilde)/"] < packed["Ürl-iri"]
    assert packed["ドメイン,例)/"] >= packed["\x7f"]


def test_cdx_index_lookup_matches_bruteforce_and_prunes(spark, tmpdir_scratch):
    """The range-partitioned sorted index returns exactly the brute-force
    startswith rows for domain-subtree, host, and >8-byte prefixes; the
    zone-map plan skips files for a selective prefix; an unknown domain
    returns nothing while opening at most one file-range."""
    from ocr_application_spark.operators.urlops import (
        build_cdx_index,
        canonical_url,
        cdx_lookup,
        surt_key,
        surt_pack64,
    )
    from ocr_application_spark.sources.snapshots import plan_scan

    doms = ["example.com", "sample.org", "webcorp.net", "dataset.io"]
    rows = [
        (f"https://WWW.h{i % 7}.{doms[i % 4]}:443/p/{i}?b=2&a={i % 3}",)
        for i in range(4000)
    ]
    urls = spark.createDataFrame(rows, "url string").select(
        canonical_url(F.col("url")).alias("url_canonical")
    )
    tbl = tmpdir_scratch + "/cdx"
    build_cdx_index(urls, tbl, target_files=16)

    keyed = urls.select(
        "url_canonical", surt_key(F.col("url_canonical")).alias("surt_key")
    )
    for prefix in ("org,sample,", "org,sample,h3)", "com,example,h0)/p/1", "io,"):
        got = sorted(
            r.surt_key for r in cdx_lookup(spark, tbl, prefix).collect()
        )
        want = sorted(
            r.surt_key
            for r in keyed.filter(F.col("surt_key").startswith(prefix)).collect()
        )
        assert got == want and len(want) > 0, prefix

    # selective prefixes must actually prune on the packed projection
    from ocr_application_spark.operators.urlops import surt_prefix_range

    lo, hi = surt_prefix_range("io,")
    p = plan_scan(tbl, {"surt_pk": (lo, hi)})
    assert p["skipped"] > 0, p

    # unknown domain: empty result, and the range keeps at most the one
    # file whose [min, max] straddles the gap
    assert cdx_lookup(spark, tbl, "zz,nowhere)").count() == 0
    lo, hi = surt_prefix_range("zz,nowhere)")
    p = plan_scan(tbl, {"surt_pk": (lo, hi)})
    assert len(p["files"]) <= 1, p

    # non-ASCII prefix head is rejected loudly (its packed range would
    # be meaningless); tails past the 8 packed bytes are fine
    import pytest as _pytest

    with _pytest.raises(ValueError):
        surt_prefix_range("ドメイン")


# --- crawl-delay directive extraction -------------------------------------------
def test_crawl_delay_winning_group_only_and_garbage_nulls(spark):
    import pandas as pd

    from ocr_application_spark.operators.urlops import robots_group_directive

    files = spark.createDataFrame(
        pd.DataFrame(
            [
                # delay in OUR group
                (0, "User-agent: sparkbot\r\nCrawl-delay: 7\r\nDisallow: /x"),
                # delay only in somebody else's group: not ours
                (1, "User-agent: otherbot\r\nCrawl-delay: 9\r\n\r\n"
                    "User-agent: sparkbot\r\nDisallow: /y"),
                # tied winning groups: first occurrence (lowest line) wins
                (2, "User-agent: sparkbot\r\nCrawl-delay: 3\r\n\r\n"
                    "User-agent: sparkbot\r\nCrawl-delay: 8"),
                # '*' fallback group carries the delay
                (3, "User-agent: *\r\nCrawl-delay: 4"),
                # no groups at all
                (4, "Disallow: /pre-group-noise"),
            ],
            columns=["host_id", "robots_txt"],
        )
    )
    out = {
        r["host_id"]: r["value"]
        for r in robots_group_directive(files, "sparkbot", "crawl-delay").collect()
    }
    assert out == {0: "7", 1: None, 2: "3", 3: "4"} or out == {0: "7", 2: "3", 3: "4"}
    # host 1's delay is in otherbot's group, host 4 has none: no rows
    assert 4 not in out and out.get(1) is None


def test_robots_group_directive_rejects_rule_fields(spark):
    import pandas as pd
    import pytest as _pytest

    from ocr_application_spark.operators.urlops import robots_group_directive

    files = spark.createDataFrame(
        pd.DataFrame([(0, "User-agent: *\r\nDisallow: /")],
                     columns=["host_id", "robots_txt"])
    )
    with _pytest.raises(ValueError):
        robots_group_directive(files, "sparkbot", "disallow")
    with _pytest.raises(ValueError):
        robots_group_directive(files, "SparkBot", "crawl-delay")


# --- frontier prioritization -------------------------------------------------


def _fp(spark, frontier_rows, score_rows):
    from ocr_application_spark.operators.urlops import frontier_priority

    f = spark.createDataFrame(
        frontier_rows,
        "url string, host string, depth long, last_fetch_day long, lastmod_day long",
    )
    s = spark.createDataFrame(score_rows, "host string, host_score long")
    return {r["url"]: r for r in frontier_priority(f, s).collect()}


def test_frontier_cold_host_scores_zero_prior(spark):
    got = _fp(
        spark,
        [("u1", "warm", 1, 0, 0), ("u2", "cold", 1, 0, 0)],
        [("warm", 7000)],
    )
    assert got["u1"]["priority_micro"] == 7000 - 250
    assert got["u2"]["priority_micro"] == -250  # prior 0, not a dropped row


def test_frontier_staleness_caps_and_clamps(spark):
    from ocr_application_spark.operators.urlops import _FP_STALE_CAP, _FP_STALE_W

    got = _fp(
        spark,
        [
            ("ancient", "h", 0, 0, 400),  # 400 days stale -> capped
            ("fresh", "h", 0, 10, 10),  # zero staleness
            ("future", "h", 0, 20, 10),  # lastmod BEFORE fetch -> clamp 0
        ],
        [],
    )
    assert got["ancient"]["priority_micro"] == _FP_STALE_W * _FP_STALE_CAP
    assert got["fresh"]["priority_micro"] == 0
    assert got["future"]["priority_micro"] == 0


def test_frontier_depth_orders_within_host(spark):
    got = _fp(
        spark,
        [("deep", "h", 9, 0, 0), ("shallow", "h", 1, 0, 0)],
        [("h", 1000)],
    )
    assert got["shallow"]["fetch_rank"] < got["deep"]["fetch_rank"]
    assert got["shallow"]["tick_idx"] == 0


# --- sitemap discovery from robots.txt ---------------------------------------


def test_robots_sitemaps_grammar(spark):
    from ocr_application_spark.operators.urlops import robots_sitemaps

    txt = "\r\n".join(
        [
            "User-agent: *",
            "Disallow: /x/",
            "Sitemap: https://a.com/s1.xml",
            "User-agent: Other",  # group start must NOT stop discovery
            "  sitemap :  https://a.com/s2.xml  # comment",
            "SITEMAP: /relative.xml",  # not absolute -> dropped
            "Sitemap: ftp://a.com/s3.xml",  # wrong scheme -> dropped
            "Sitemapish: https://a.com/decoy.xml",  # not the field
            "Sitemap: http://a.com/s4.xml?q=1",
        ]
    )
    df = spark.createDataFrame([(1, txt)], "host_id long, robots_txt string")
    got = [(r["src_line"], r["sitemap_url"]) for r in
           robots_sitemaps(df).orderBy("src_line").collect()]
    assert got == [
        (3, "https://a.com/s1.xml"),
        (5, "https://a.com/s2.xml"),
        (9, "http://a.com/s4.xml?q=1"),
    ]
