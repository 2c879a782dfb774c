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
