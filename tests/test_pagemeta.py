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


# --- heading outline ---------------------------------------------------------

from ocr_application_spark.operators.pagemeta import (  # noqa: E402
    extract_headings,
    heading_outline,
)


def _outline(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html_text string")
    rows = heading_outline(extract_headings(df)).orderBy("pos").collect()
    return [(r.level, r.heading, r.sec_path) for r in rows]


def test_outline_counters_reset_on_lower_level(spark):
    out = _outline(
        spark,
        "<h1>A</h1><h2>B</h2><h2>C</h2><h1>D</h1><h2>E</h2><h3>F</h3>",
    )
    assert out == [
        (1, "A", "1"),
        (2, "B", "1.1"),
        (2, "C", "1.2"),
        (1, "D", "2"),
        (2, "E", "2.1"),
        (3, "F", "2.1.1"),
    ]


def test_outline_zero_prefix_and_skipped_level(spark):
    # h2 before any h1 -> "0."; h3 directly under h1 -> c2 stays 0
    out = _outline(spark, "<h2>S</h2><h1>T</h1><h3>U</h3>")
    assert out == [(2, "S", "0.1"), (1, "T", "1"), (3, "U", "1.0.1")]


def test_outline_depth_caps_at_three(spark):
    # h4-h6 carry the enclosing numbered section's path, never a 4th part
    out = _outline(spark, "<h1>A</h1><h2>B</h2><h3>C</h3><h4>D</h4><h6>E</h6>")
    assert out[-2:] == [(4, "D", "1.1.1"), (6, "E", "1.1.1")]


def test_outline_text_only_matching_and_decoys(spark):
    # inline markup breaks the text-only match; <h7> is not a heading;
    # attributes and tag case are tolerated
    out = _outline(
        spark,
        '<H2 CLASS="x">Kept</H2><h2>Rich <b>b</b> dropped</h2><h7>No</h7>',
    )
    assert out == [(2, "Kept", "0.1")]


def test_outline_headingless_doc_absent(spark):
    df = spark.createDataFrame(
        [(1, "<p>plain</p>"), (2, "<h1>T</h1>")],
        "doc_id long, html_text string",
    )
    rows = heading_outline(extract_headings(df)).collect()
    assert [r.doc_id for r in rows] == [2]


# --- section chunks ----------------------------------------------------------

from ocr_application_spark.operators.pagemeta import section_chunks  # noqa: E402


def _chunks(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html_text string")
    rows = section_chunks(df).orderBy("pos").collect()
    return [(r.sec_path, r.heading, r.body) for r in rows]


def test_chunks_bodies_follow_their_headings(spark):
    out = _chunks(
        spark,
        "<h1>A</h1><p>first body</p><h2>B</h2>second<h1>C</h1><div>third</div>",
    )
    assert out == [
        ("1", "A", "first body"),
        ("1.1", "B", "second"),
        ("2", "C", "third"),
    ]


def test_chunks_preamble_dropped_and_whitespace_collapsed(spark):
    out = _chunks(
        spark,
        "pre-heading text is not a chunk<h2>N</h2>line one\nline two\t<br>tail",
    )
    assert out == [("0.1", "N", "line one line two tail")]


def test_chunks_trailing_and_empty_sections(spark):
    # a heading at the very end of the page yields an empty body (the
    # trailing split segment is kept, in both engines)
    out = _chunks(spark, "<h1>A</h1>body<h2>End</h2>")
    assert out == [("1", "A", "body"), ("1.1", "End", "")]


def test_chunks_tag_stripping_keeps_text(spark):
    out = _chunks(spark, '<h1>A</h1><ul><li>x</li><li class="z">y</li></ul>')
    assert out == [("1", "A", "x y")]
