"""Unit tests for feeds: RSS/Atom discovery + entry parsing.

Oracle parity value-checks the fixture corpus at both SFs; these pin
the library surface on markup the fixture can't reach: href resolution
forms, rel token lists, malformed dates, entity unescaping, weekday
stripping, and zero-row pages/feeds.
"""

import pandas as pd

from ocr_application_spark.operators.feeds import discover_feeds, parse_feed_entries


def _feeds(spark, html, page_url="https://h1.example.com/blog/post.html"):
    df = spark.createDataFrame(
        pd.DataFrame({"page_url": [page_url], "html_text": [html]})
    )
    return discover_feeds(df).orderBy("tag_idx").collect()


def _entries(spark, xml):
    df = spark.createDataFrame(pd.DataFrame({"feed_xml": [xml]}))
    return parse_feed_entries(df).orderBy("entry_idx").collect()


# --- discovery ----------------------------------------------------------------

def test_discover_absolute_root_and_path_relative(spark):
    rows = _feeds(
        spark,
        '<head>'
        '<link rel="alternate" type="application/rss+xml" href="https://x.org/f">'
        '<link rel="alternate" type="application/rss+xml" href="/rss.xml">'
        '<link rel="alternate" type="application/atom+xml" href="atom.xml">'
        '<link rel="alternate" type="application/atom+xml" href="//cdn.e.com/a">'
        "</head>",
    )
    assert [r.feed_url for r in rows] == [
        "https://x.org/f",
        "https://h1.example.com/rss.xml",
        "https://h1.example.com/blog/atom.xml",
        "https://cdn.e.com/a",
    ]


def test_discover_requires_alternate_token_and_feed_type(spark):
    rows = _feeds(
        spark,
        '<head>'
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="alternate" type="text/html" href="/en">'
        '<link rel="alternate nofollow" type="application/rss+xml" href="/f1">'
        '<link rel="alternates" type="application/rss+xml" href="/f2">'
        "</head>",
    )
    # only the token-list row survives: 'alternates' is not the token
    assert [(r.tag_idx, r.feed_url) for r in rows] == [
        (2, "https://h1.example.com/f1")
    ]


def test_discover_no_links_zero_rows(spark):
    assert _feeds(spark, "<html><body><p>prose</p></body></html>") == []


def test_discover_unquoted_and_case_insensitive(spark):
    rows = _feeds(
        spark,
        "<HEAD><LINK REL=ALTERNATE TYPE=application/atom+xml HREF=/a></HEAD>",
    )
    assert [(r.feed_kind, r.feed_url) for r in rows] == [
        ("atom", "https://h1.example.com/a")
    ]


def test_discover_tag_idx_counts_all_link_tags(spark):
    rows = _feeds(
        spark,
        '<link rel="stylesheet" href="/s.css">'
        '<link rel="alternate" type="application/rss+xml" href="/f">',
    )
    assert [r.tag_idx for r in rows] == [1]


# --- parsing ------------------------------------------------------------------

def test_parse_rss_weekday_optional_and_stripped(spark):
    xml = (
        '<rss version="2.0"><channel><title>C</title>'
        "<item><title>A</title><link>https://e.com/1</link>"
        "<pubDate>Tue, 05 Aug 2024 12:30:00 GMT</pubDate></item>"
        "<item><title>B</title><link>https://e.com/2</link>"
        "<pubDate>05 Aug 2024 12:31:00 GMT</pubDate></item>"
        "</channel></rss>"
    )
    rows = _entries(spark, xml)
    assert [r.pub_epoch_us for r in rows] == [1722861000000000, 1722861060000000]
    assert all(r.feed_kind == "rss" for r in rows)


def test_parse_atom_iso_and_href(spark):
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>C</title>'
        '<entry><title>A</title><link rel="alternate" href="https://e.com/a"/>'
        "<updated>2024-08-05T12:30:00Z</updated></entry></feed>"
    )
    rows = _entries(spark, xml)
    assert [(r.feed_kind, r.entry_url, r.pub_epoch_us) for r in rows] == [
        ("atom", "https://e.com/a", 1722861000000000)
    ]


def test_parse_malformed_date_is_null_not_crash(spark):
    # ANSI mode is on; a garbage date must quarantine to NULL (ADVICE
    # r03's warc_ts hazard class), never throw
    xml = (
        "<rss><channel><item><title>t</title><link>u</link>"
        "<pubDate>not a date</pubDate></item>"
        "<item><title>t2</title><link>u2</link></item></channel></rss>"
    )
    rows = _entries(spark, xml)
    assert [r.pub_epoch_us for r in rows] == [None, None]


def test_parse_entity_unescape_in_title_and_url(spark):
    xml = (
        "<rss><channel><item>"
        "<title>Q&amp;A &lt;live&gt; &quot;now&quot; &amp;lt;kept&amp;gt;</title>"
        "<link>https://e.com/?a=1&amp;b=2</link></item></channel></rss>"
    )
    r = _entries(spark, xml)[0]
    assert r.title == 'Q&A <live> "now" &lt;kept&gt;'
    assert r.entry_url == "https://e.com/?a=1&b=2"


def test_parse_channel_title_not_grabbed(spark):
    # field extraction is scoped to the entry substring: the channel's
    # <title>/<link> must not leak into entry rows
    xml = (
        "<rss><channel><title>Channel</title><link>https://chan</link>"
        "<item><title>Entry</title><link>https://e.com/e</link></item>"
        "</channel></rss>"
    )
    rows = _entries(spark, xml)
    assert [(r.title, r.entry_url) for r in rows] == [("Entry", "https://e.com/e")]


def test_parse_empty_feed_zero_rows(spark):
    assert _entries(spark, "<rss><channel><title>C</title></channel></rss>") == []
    assert _entries(spark, "<feed><title>C</title></feed>") == []


def test_parse_carried_columns_and_entry_order(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "feed_id": [7],
                "feed_xml": [
                    "<rss><channel>"
                    "<item><title>a</title><link>u1</link></item>"
                    "<item><title>b</title><link>u2</link></item>"
                    "</channel></rss>"
                ],
            }
        )
    )
    rows = parse_feed_entries(df).orderBy("entry_idx").collect()
    assert [(r.feed_id, r.entry_idx, r.title) for r in rows] == [
        (7, 0, "a"),
        (7, 1, "b"),
    ]
