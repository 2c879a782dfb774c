"""hreflang variant clusters (pagemeta.hreflang_clusters): semantics on
hand-built heads; the gate query's oracle parity runs in
test_oracle_parity (sf0.001) and test_oracle_parity_sf01 (driver SF)."""

import pandas as pd

from ocr_application_spark.operators.pagemeta import hreflang_clusters


def _page(url, alts, xdef=None, decoy=False):
    tags = "".join(
        f'<link rel="alternate" hreflang="{l}" href="{h}">' for l, h in alts
    )
    if xdef:
        tags += f"<link href='{xdef}' hreflang='x-default' rel='alternate'>"
    if decoy:
        tags += '<link rel="stylesheet" hreflang="en" href="/s.css">'
    return url, f"<head>{tags}</head>"


def _run(spark, pages):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, u, h) for i, (u, h) in enumerate(pages)],
            columns=["doc_id", "url", "html_text"],
        )
    )
    return {r["url"]: r for r in hreflang_clusters(df).collect()}


def test_xdefault_wins_and_reciprocal_cluster(spark):
    alts = [("en", "https://s/en"), ("fr", "https://s/fr")]
    out = _run(spark, [
        _page("https://s/en", alts, xdef="https://s/en"),
        _page("https://s/fr", alts, xdef="https://s/en"),
    ])
    assert out["https://s/en"]["cluster_id"] == "https://s/en"
    assert out["https://s/en"]["is_head"] and not out["https://s/fr"]["is_head"]
    assert out["https://s/fr"]["cluster_size"] == 2
    assert out["https://s/en"]["n_alts"] == 2


def test_min_href_fallback_without_xdefault(spark):
    alts = [("fr", "https://s/fr"), ("de", "https://s/de")]
    out = _run(spark, [_page("https://s/fr", alts)])
    assert out["https://s/fr"]["cluster_id"] == "https://s/de"
    assert not out["https://s/fr"]["is_head"]


def test_decoy_rel_is_filtered_and_no_annotations_null_cluster(spark):
    out = _run(spark, [
        _page("https://s/solo", [], decoy=True),
        _page("https://s/one", [("en", "https://s/one")]),
    ])
    assert out["https://s/solo"]["cluster_id"] is None
    assert out["https://s/solo"]["n_alts"] == 0
    assert out["https://s/one"]["cluster_id"] == "https://s/one"
    assert out["https://s/one"]["is_head"]


def test_inconsistent_annotations_split_clusters_deterministically(spark):
    # one sibling lists {en,fr,de}, the other only {en,fr}: their
    # min-href fallbacks disagree — two clusters, sizes 1 and 1
    out = _run(spark, [
        _page("https://s/en", [("en", "https://s/en"), ("fr", "https://s/fr"),
                              ("de", "https://s/de")]),
        _page("https://s/fr", [("en", "https://s/en"), ("fr", "https://s/fr")]),
    ])
    assert out["https://s/en"]["cluster_id"] == "https://s/de"
    assert out["https://s/fr"]["cluster_id"] == "https://s/en"
    assert out["https://s/en"]["cluster_size"] == 1


def test_bitext_candidates_cluster_bounded_banded_cross_lingual(spark):
    """bitext_candidates: pairs only WITHIN a cluster, only across
    languages (lang_src < lang_tgt canonicalizes), length-ratio in
    exact basis points with zero-length sides scoring 0, keep banded
    at >= 4000 bp (2.5x)."""
    import pyspark.sql.functions as F

    from ocr_application_spark.operators.pagemeta import bitext_candidates

    clusters = spark.createDataFrame(
        [
            (1, "https://s/a/en", "c1"),
            (2, "https://s/a/fr", "c1"),
            (3, "https://s/a/de", "c1"),
            (4, "https://s/b/en", "c2"),
            (5, "https://s/b/fr", "c2"),
            (6, "https://s/c/en", "c3"),  # singleton: no pairs
        ],
        "doc_id long, url string, cluster_id string",
    )
    doclangs = spark.createDataFrame(
        [
            (1, "en", 1000),
            (2, "fr", 1100),  # vs en: 9090 bp -> keep
            (3, "de", 300),   # vs en: 3000 bp, vs fr: 2727 bp -> drop
            (4, "en", 500),
            (5, "fr", 0),     # zero side -> ratio 0, drop
            (6, "en", 800),
        ],
        "doc_id long, lang string, n_chars long",
    )
    rows = {
        (r["cluster_id"], r["lang_src"], r["lang_tgt"]): r
        for r in bitext_candidates(clusters, doclangs).collect()
    }
    # c1: 3 cross-lingual pairs; c2: 1; c3: 0 — never cross-cluster
    assert set(rows) == {
        ("c1", "de", "en"), ("c1", "de", "fr"), ("c1", "en", "fr"),
        ("c2", "en", "fr"),
    }
    assert rows[("c1", "en", "fr")]["len_ratio_bp"] == 9090
    assert rows[("c1", "en", "fr")]["keep"] is True
    assert rows[("c1", "de", "en")]["len_ratio_bp"] == 3000
    assert rows[("c1", "de", "en")]["keep"] is False
    assert rows[("c2", "en", "fr")]["len_ratio_bp"] == 0
    assert rows[("c2", "en", "fr")]["keep"] is False
    # lang ordering is canonical: no (en, de) mirror rows
    assert not any(a > b for _, a, b in rows)
