"""Host PageRank + HITS (kernels/links): randomized differential vs
pure-Python twins of the integer specs, teleport-floor / hub-vs-
authority properties, input validation, empty graph."""

import random

import pytest

from ocr_application_spark.kernels.links import host_hits, host_pagerank

SCALE = 10**9


def _reference_pagerank(edges, iterations=4, scale=SCALE, dp=85):
    """Dict-model twin of the kernel's integer spec: same op sequence
    (r0 = scale div n; contrib = (rank*w) div wtot; rank' =
    ((100-dp)*r0) div 100 + (dp*sum) div 100), so any divergence is a
    kernel bug, not float noise."""
    w = {}
    for s, d, k in edges:
        w[(s, d)] = w.get((s, d), 0) + k
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    if not nodes:
        return {}
    wtot = {}
    for (s, _), k in w.items():
        wtot[s] = wtot.get(s, 0) + k
    r0 = scale // len(nodes)
    teleport = ((100 - dp) * r0) // 100
    rank = {h: r0 for h in nodes}
    for _ in range(iterations):
        inflow = {h: 0 for h in nodes}
        for (s, d), k in w.items():
            inflow[d] += (rank[s] * k) // wtot[s]
        rank = {h: teleport + (dp * inflow[h]) // 100 for h in nodes}
    return rank


def _to_df(spark, edges):
    return spark.createDataFrame(
        [(s, d, k) for s, d, k in edges] or [],
        "src_host string, dst_host string, n_links long",
    )


def test_pagerank_matches_dict_model_on_random_graphs(spark):
    rng = random.Random(20260818)
    for trial in range(6):
        n_hosts = rng.randint(2, 12)
        hosts = [f"h{i}" for i in range(n_hosts)]
        # duplicate (s, d) rows on purpose: the kernel must aggregate
        # them identically to the dict model's +=
        edges = [
            (rng.choice(hosts), rng.choice(hosts), rng.randint(1, 5))
            for _ in range(rng.randint(1, 4 * n_hosts))
        ]
        iters = rng.randint(1, 6)
        got = {
            r["host"]: r["rank"]
            for r in host_pagerank(_to_df(spark, edges), iterations=iters).collect()
        }
        want = _reference_pagerank(edges, iterations=iters)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_pagerank_inlink_free_host_sits_at_teleport_floor(spark):
    # a -> b -> c; a has no inlinks, so after any full iteration its
    # rank is EXACTLY the teleport term; the chain's sink c outranks it
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "b", 1)]
    ranks = {
        r["host"]: r["rank"]
        for r in host_pagerank(_to_df(spark, edges), iterations=5).collect()
    }
    r0 = SCALE // 3
    teleport = (15 * r0) // 100
    assert ranks["a"] == teleport
    assert ranks["b"] > ranks["a"]
    # total mass never exceeds the fixed-point scale (overflow bound
    # the kernel docstring relies on)
    assert sum(ranks.values()) <= SCALE


def test_pagerank_dangling_host_decays_not_crashes(spark):
    # d is dangling (mass sinks out); it still holds teleport + inflow
    edges = [("a", "d", 3), ("b", "d", 1)]
    ranks = {
        r["host"]: r["rank"]
        for r in host_pagerank(_to_df(spark, edges), iterations=4).collect()
    }
    assert set(ranks) == {"a", "b", "d"}
    assert ranks["d"] > ranks["a"] == ranks["b"]


def test_pagerank_input_validation(spark):
    df = _to_df(spark, [("a", "b", 1)])
    with pytest.raises(ValueError, match="iterations"):
        host_pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="iterations"):
        host_pagerank(df, iterations=51)
    with pytest.raises(ValueError, match="damping_pct"):
        host_pagerank(df, damping_pct=0)
    with pytest.raises(ValueError, match="damping_pct"):
        host_pagerank(df, damping_pct=100)


def test_pagerank_empty_graph(spark):
    out = host_pagerank(_to_df(spark, []), iterations=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["host", "rank"]


def _reference_hits(edges, iterations=3, scale=10**6):
    """Dict-model twin of host_hits' integer spec: exact w*score sums,
    then ONE L1-normalizing floor division per phase, hub phase consuming
    the freshly normalized authorities."""
    w = {}
    for s, d, k in edges:
        w[(s, d)] = w.get((s, d), 0) + k
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    if not nodes:
        return {}
    h0 = scale // len(nodes)
    hub = {n: h0 for n in nodes}
    auth = {n: h0 for n in nodes}

    def _norm(raw):
        tot = sum(raw.values())
        return {n: (scale * raw.get(n, 0)) // tot if tot else 0 for n in nodes}

    for _ in range(iterations):
        a_raw = {}
        for (s, d), k in w.items():
            a_raw[d] = a_raw.get(d, 0) + k * hub[s]
        auth = _norm(a_raw)
        h_raw = {}
        for (s, d), k in w.items():
            h_raw[s] = h_raw.get(s, 0) + k * auth[d]
        hub = _norm(h_raw)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_dict_model_on_random_graphs(spark):
    rng = random.Random(20260818)
    for trial in range(6):
        n_hosts = rng.randint(2, 12)
        hosts = [f"h{i}" for i in range(n_hosts)]
        edges = [
            (rng.choice(hosts), rng.choice(hosts), rng.randint(1, 5))
            for _ in range(rng.randint(1, 4 * n_hosts))
        ]
        iters = rng.randint(1, 4)
        got = {
            r["host"]: (r["hub"], r["authority"])
            for r in host_hits(_to_df(spark, edges), iterations=iters).collect()
        }
        want = _reference_hits(edges, iterations=iters)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_hits_directory_host_is_hub_not_authority(spark):
    # "dir" only points outward (a link directory): after one full
    # iteration its authority is exactly 0 (no inlinks) while it owns
    # all the hub mass; the pointed-at pages split the authority mass.
    edges = [("dir", "a", 1), ("dir", "b", 1), ("dir", "c", 2)]
    got = {
        r["host"]: (r["hub"], r["authority"])
        for r in host_hits(_to_df(spark, edges), iterations=3).collect()
    }
    assert got["dir"][1] == 0  # no inlinks => zero authority
    assert got["a"][0] == got["b"][0] == got["c"][0] == 0  # no outlinks => zero hub
    assert got["dir"][0] == 10**6  # sole hub takes the whole L1 scale
    assert got["c"][1] > got["a"][1] == got["b"][1]  # weight-2 edge wins
    # L1 invariant: each normalized side sums to <= scale (floor losses)
    assert sum(a for _, a in got.values()) <= 10**6


def test_hits_empty_graph_and_validation(spark):
    out = host_hits(_to_df(spark, []), iterations=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["host", "hub", "authority"]
    df = _to_df(spark, [("a", "b", 1)])
    with pytest.raises(ValueError, match="iterations"):
        host_hits(df, iterations=0)
    with pytest.raises(ValueError, match="scale"):
        host_hits(df, scale=10)
    bad = spark.createDataFrame(
        [("a", "b", 0)], "src_host string, dst_host string, n_links long"
    )
    with pytest.raises(Exception, match="n_links must be > 0"):
        host_hits(bad, iterations=1).collect()


def test_nonpositive_or_null_weights_fail_loud(spark):
    from ocr_application_spark.kernels.links import host_pagerank

    for w in (0, -3, None):
        edges = spark.createDataFrame(
            [("a", "b", w)], "src_host string, dst_host string, n_links long"
        )
        with pytest.raises(Exception, match="n_links must be > 0"):
            host_pagerank(edges, iterations=1).collect()
    with pytest.raises(ValueError, match="scale"):
        host_pagerank(
            spark.createDataFrame(
                [("a", "b", 1)], "src_host string, dst_host string, n_links long"
            ),
            scale=10,
        )


def test_host_components_blocks_and_singletons(spark):
    """12 blocks of 8 + 4 edgeless singleton hosts; every member labels
    with its block's smallest host."""
    from ocr_application_spark.operators.kernels_entry import link_host_components

    out = {r["host"]: r["cluster_rep"] for r in
           link_host_components(spark, "/root/testdata/sf0.001").collect()}
    assert len(out) == 100
    for h, rep in out.items():
        n = int(h[1:])
        if n >= 96:
            assert rep == h  # singleton
        else:
            assert rep == f"h{n - n % 8:02d}"
