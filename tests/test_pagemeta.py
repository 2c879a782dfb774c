"""pagemeta: head-metadata extraction + the page-level REP gate.

Robustness cases the sf-fixture variants don't isolate one by one:
attribute order, quote styles, tag case, missing fields, the ``none``
token, header-vs-meta precedence, and whitespace-tolerant token
matching (``noindex , nofollow`` must restrict; ``unindexable`` — a
token merely CONTAINING noindex — must not).
"""

from pyspark.sql import functions as F

from ocr_application_spark.operators.pagemeta import (
    extract_page_meta,
    page_index_gate,
)


def _meta(spark, html):
    df = spark.createDataFrame([(html,)], "html_text string")
    return extract_page_meta(df).first()


def test_extracts_title_lang_canonical_robots(spark):
    r = _meta(
        spark,
        '<html lang="fr-CA"><head><title>A &amp; B</title>'
        '<link rel="canonical" href="https://e.com/x?a=1">'
        '<meta name="robots" content="noindex, nofollow"></head>',
    )
    assert r.title == "A &amp; B"
    assert r.html_lang == "fr-CA"
    assert r.canonical_href == "https://e.com/x?a=1"
    assert r.robots_content == "noindex, nofollow"


def test_href_before_rel_and_single_quotes(spark):
    r = _meta(spark, "<LINK HREF='https://e.com/y' REL='canonical'>")
    assert r.canonical_href == "https://e.com/y"


def test_unquoted_attributes_and_missing_fields_yield_empty(spark):
    r = _meta(spark, "<html lang=en><head><meta name=robots content=all></head>")
    assert r.html_lang == "en"
    assert r.robots_content == "all"
    assert r.title == ""
    assert r.canonical_href == ""


def test_html_without_lang_does_not_steal_other_attrs(spark):
    # class= contains no lang=; the pattern must not capture from a
    # different attribute or a lang= in a LATER tag's text
    r = _meta(spark, '<html class="lang-picker"><head><title>t</title></head>')
    assert r.html_lang == ""


def _gate(spark, meta, hdr):
    df = spark.createDataFrame(
        [(meta, hdr)], "robots_content string, x_robots_tag string"
    )
    return page_index_gate(df).first()


def test_gate_none_restricts_both(spark):
    r = _gate(spark, "none", "")
    assert not r.indexable and not r.followable


def test_gate_most_restrictive_source_wins(spark):
    r = _gate(spark, "index, follow", "NOINDEX")
    assert not r.indexable and r.followable
    r = _gate(spark, "nofollow", "")
    assert r.indexable and not r.followable


def test_gate_whitespace_tolerant_and_no_substring_match(spark):
    r = _gate(spark, "noindex , noarchive", "")
    assert not r.indexable and r.followable
    # 'unindexable' CONTAINS 'noindex' lexically but is not the token
    r = _gate(spark, "unindexable", "")
    assert r.indexable and r.followable


def test_gate_empty_values_restrict_nothing(spark):
    r = _gate(spark, "", "")
    assert r.indexable and r.followable


def test_canonical_feeds_urlops_canonicalizer(spark):
    # integration: the page's declared canonical goes through
    # urlops.canonical_url unchanged when already canonical
    from ocr_application_spark.operators.urlops import canonical_url

    df = spark.createDataFrame(
        [('<link rel="canonical" href="https://E.com:443/a?utm_source=f&b=1">',)],
        "html_text string",
    )
    out = (
        extract_page_meta(df)
        .select(canonical_url(F.col("canonical_href")).alias("c"))
        .first()
    )
    assert out.c == "https://e.com/a?b=1"
