"""Unit tests for structdata: Open Graph + JSON-LD extraction.

The oracle-parity suite value-checks the fixture grid at both SFs; these
pin the library-surface behaviors on handwritten pages the fixtures
can't reach: attribute-order precedence, multi-tag pages, absent and
malformed blocks, timestamp-parse failure modes, and that only the
FIRST ld+json block is taken.
"""

import pandas as pd

from ocr_application_spark.operators.structdata import (
    extract_jsonld,
    extract_opengraph,
)


def _og(spark, html):
    df = spark.createDataFrame(pd.DataFrame({"html_text": [html]}))
    return extract_opengraph(df).first()


def _ld(spark, html):
    df = spark.createDataFrame(pd.DataFrame({"html_text": [html]}))
    return extract_jsonld(df).first()


def test_og_both_attribute_orders_and_coalesce(spark):
    r = _og(
        spark,
        '<meta content="CP Title" property="og:title">'
        '<meta property="og:type" content="article">',
    )
    assert r.og_title == "CP Title"
    assert r.og_type == "article"
    assert r.og_image == ""


def test_og_property_content_order_wins_when_both_forms_present(spark):
    # coalesce prefers the property-first extraction when non-empty
    r = _og(
        spark,
        '<meta property="og:title" content="PC"><meta content="CP" property="og:title">',
    )
    assert r.og_title == "PC"


def test_og_unquoted_and_uppercase(spark):
    r = _og(spark, "<META PROPERTY=og:image CONTENT=https://e.com/i.png>")
    assert r.og_image == "https://e.com/i.png"


def test_og_published_time_parses_both_iso_forms(spark):
    for sep in ("T", " "):
        r = _og(
            spark,
            f'<meta property="article:published_time" content="2024-03-05{sep}07:00:00">',
        )
        assert r.published_time == f"2024-03-05{sep}07:00:00"
        assert r.published_epoch_us == 1709622000000000


def test_og_unparseable_time_is_null_not_error(spark):
    r = _og(spark, '<meta property="article:published_time" content="yesterday">')
    assert r.published_time == "yesterday"
    assert r.published_epoch_us is None


def test_og_absent_time_is_empty_and_null(spark):
    r = _og(spark, "<html><head></head></html>")
    assert r.published_time == "" and r.published_epoch_us is None


def test_og_one_tag_cannot_satisfy_two_properties(spark):
    # [^>]* cannot cross the tag boundary: og:type must not be stolen
    # from the og:title tag's content
    r = _og(spark, '<meta property="og:title" content="only title">')
    assert r.og_title == "only title"
    assert r.og_type == ""


def test_jsonld_first_block_wins_and_fields_extract(spark):
    html = (
        '<script type="application/ld+json">\n'
        '{"@type": "Article", "headline": "First", '
        '"datePublished": "2024-03-05T07:00:00"}\n</script>'
        '<script type="application/ld+json">{"@type":"Other"}</script>'
    )
    r = _ld(spark, html)
    assert r.jsonld_type == "Article"
    assert r.headline == "First"
    assert r.date_published == "2024-03-05T07:00:00"
    assert r.date_epoch_us == 1709622000000000


def test_jsonld_plain_script_does_not_match(spark):
    r = _ld(spark, "<script>var x = {\"@type\": \"Nope\"};</script>")
    assert r.jsonld_block == ""
    assert r.jsonld_type is None and r.headline is None
    assert r.date_epoch_us is None


def test_jsonld_malformed_block_keeps_raw_nulls_fields(spark):
    r = _ld(spark, '<script type="application/ld+json">{"@type": "Artic</script>')
    assert r.jsonld_block == '{"@type": "Artic'
    assert r.jsonld_type is None
    assert r.date_epoch_us is None


def test_jsonld_single_quoted_attr_and_extra_attrs(spark):
    r = _ld(
        spark,
        "<script async type='application/ld+json' id=\"ld\">"
        '{"@type":"NewsArticle","headline":"H"}</script>',
    )
    assert r.jsonld_type == "NewsArticle" and r.headline == "H"


def test_jsonld_missing_keys_are_null(spark):
    r = _ld(spark, '<script type="application/ld+json">{"@type":"Thing"}</script>')
    assert r.jsonld_type == "Thing"
    assert r.headline is None and r.date_published is None
