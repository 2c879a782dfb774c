"""Unit tests for redirects: pointer-doubling chain resolution.

Oracle parity proves the doubling algebra against a hop-by-hop
recursive-CTE walk at both SFs; these pin the library surface on
handwritten graphs: the cap boundary, loops, chains into loops,
Locations pointing outside the requested node set, and branching into
a shared tail.
"""

import pandas as pd

from ocr_application_spark.operators.redirects import MAX_HOPS, resolve_redirects


def _resolve(spark, nodes, edges):
    n = spark.createDataFrame(pd.DataFrame({"url": nodes}))
    e = spark.createDataFrame(
        pd.DataFrame({"src": [s for s, _ in edges], "dst": [d for _, d in edges]})
    )
    return {r.url: (r.final_url, r.n_hops, r.status) for r in resolve_redirects(n, e).collect()}


def _chain(n):
    return [(f"u{i}", f"u{i+1}") for i in range(n)]


def test_terminal_resolves_to_itself_zero_hops(spark):
    out = _resolve(spark, ["t"], [("a", "t")])
    assert out == {"t": ("t", 0, "ok")}


def test_chain_exactly_at_cap_is_ok(spark):
    out = _resolve(spark, ["u0"], _chain(MAX_HOPS))
    assert out["u0"] == (f"u{MAX_HOPS}", MAX_HOPS, "ok")


def test_chain_one_past_cap_is_too_many(spark):
    out = _resolve(spark, ["u0"], _chain(MAX_HOPS + 1))
    final, hops, status = out["u0"]
    assert status == "too_many_redirects" and hops == MAX_HOPS
    assert final == f"u{MAX_HOPS}"


def test_two_cycle_loop_is_too_many(spark):
    out = _resolve(spark, ["a", "b"], [("a", "b"), ("b", "a")])
    assert out["a"][2] == "too_many_redirects"
    assert out["b"][2] == "too_many_redirects"
    assert out["a"][1] == MAX_HOPS


def test_chain_into_loop_is_too_many(spark):
    out = _resolve(spark, ["s"], [("s", "a"), ("a", "b"), ("b", "a")])
    assert out["s"][2] == "too_many_redirects"


def test_location_outside_node_set_still_resolves(spark):
    # the walk must traverse urls never requested as nodes
    out = _resolve(spark, ["s"], [("s", "x"), ("x", "y")])
    assert out == {"s": ("y", 2, "ok")}
    assert "x" not in out and "y" not in out  # output restricted to nodes


def test_two_sources_share_a_tail(spark):
    edges = [("a1", "m"), ("a2", "m"), ("m", "t")]
    out = _resolve(spark, ["a1", "a2", "m", "t"], edges)
    assert out["a1"] == ("t", 2, "ok")
    assert out["a2"] == ("t", 2, "ok")
    assert out["m"] == ("t", 1, "ok")
    assert out["t"] == ("t", 0, "ok")


# --- pagination series (rel=next chains, reversed walk) -------------------------
import pandas as pd  # noqa: E402

from ocr_application_spark.operators.redirects import (  # noqa: E402
    extract_next_links,
    pagination_series,
)


def _series(spark, pages, extra_edges=()):
    df = spark.createDataFrame(pd.DataFrame(pages, columns=["url", "html_text"]))
    edges = extract_next_links(df)
    if extra_edges:
        edges = edges.union(
            spark.createDataFrame(pd.DataFrame(list(extra_edges), columns=["src", "dst"]))
        )
    return {r["url"]: r for r in pagination_series(df.select("url"), edges).collect()}


def _page_chain(n, prefix="https://s/p"):
    pages = []
    for i in range(n):
        nxt = (
            f'<link rel="next" href="{prefix}{i + 1}">' if i + 1 < n else ""
        )
        pages.append((f"{prefix}{i}", f"<head>{nxt}</head>"))
    return pages


def test_positions_head_and_cap(spark):
    out = _series(spark, _page_chain(12))
    assert out["https://s/p0"]["page_no"] == 1
    assert out["https://s/p0"]["status"] == "ok"
    # position 8 = exactly MAX_HOPS back: still ok
    assert out["https://s/p8"]["page_no"] == 9
    assert out["https://s/p8"]["status"] == "ok"
    assert all(out[f"https://s/p{i}"]["series_id"] == "https://s/p0" for i in range(9))
    # beyond the cap: honest verdict, never a wrong head
    assert out["https://s/p9"]["status"] == "chain_too_deep"
    assert out["https://s/p11"]["status"] == "chain_too_deep"


def test_prev_decoy_and_attr_orders(spark):
    pages = [
        ("https://a/1", '<head><link rel="prev" href="https://a/0">'
                        "<link href='https://a/2' rel='next'></head>"),
        ("https://a/2", '<head><link rel="prev" href="https://a/1"></head>'),
    ]
    out = _series(spark, pages)
    assert out["https://a/2"]["series_id"] == "https://a/1"
    assert out["https://a/2"]["page_no"] == 2
    # rel=prev alone creates no edge: page 1 is its own head
    assert out["https://a/1"]["page_no"] == 1


def test_duplicate_next_claims_determinize_to_min_predecessor(spark):
    # two pages claim the same next page: the reversed relation picks
    # the lexicographically smallest claimant, never fans out
    pages = [
        ("https://a/x", '<head><link rel="next" href="https://a/t"></head>'),
        ("https://a/b", '<head><link rel="next" href="https://a/t"></head>'),
        ("https://a/t", "<head></head>"),
    ]
    out = _series(spark, pages)
    assert out["https://a/t"]["series_id"] == "https://a/b"
    assert out["https://a/t"]["page_no"] == 2
    assert len(out) == 3


def test_next_pointing_outside_crawled_set_stays_resolvable(spark):
    # the advertised next page was never crawled: existing pages still
    # resolve (walk domain is nodes ∪ endpoints)
    pages = [("https://a/1", '<head><link rel="next" href="https://a/ghost"></head>')]
    out = _series(spark, pages)
    assert out["https://a/1"]["page_no"] == 1 and out["https://a/1"]["status"] == "ok"
