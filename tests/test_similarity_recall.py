"""IVF recall vs the exact brute-force oracle."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _recall_vs(exact_sets, rows):
    sets = {}
    for r in rows:
        sets.setdefault(r.q_id, set()).add(r.cand_id)
    hits = sum(len(exact_sets[q] & sets.get(q, set())) for q in exact_sets)
    return hits / sum(len(v) for v in exact_sets.values())


def test_ivf_recall_against_brute_force(spark):
    Q = entrymod.queries()
    exact = Q["ann_cosine_topk"](spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.cand_id)

    ivf = Q["ann_ivf_topk"](spark, SF).collect()
    assert {r.q_id for r in ivf} == set(exact_sets)  # every query answered
    recall = _recall_vs(exact_sets, ivf)
    # random 64-d corpus is the worst case for IVF; probing 4/16 cells
    # must still find a substantial share of true top-5
    assert recall >= 0.35, f"IVF recall {recall:.2f}"


def test_ivf_recall_curve_over_nprobe(spark):
    """nprobe is the recall/cost dial: recall must be (weakly) monotone
    in nprobe, and probing all 16 cells must recover (almost) everything
    — 'almost' only because ann_ivf_topk ranks by float cosine while the
    brute-force reference ranks by quantized cosine, so rank-5/6 ties
    may land differently. The per-nprobe numbers feed PERF.md's curve."""
    from ocr_application_spark.operators.ann_ivf import K_CELLS, ann_ivf_topk

    Q = entrymod.queries()
    exact = Q["ann_cosine_topk"](spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.cand_id)

    recalls = {}
    for nprobe in (1, 2, 4, 8, K_CELLS):
        recalls[nprobe] = _recall_vs(
            exact_sets, ann_ivf_topk(spark, SF, nprobe=nprobe).collect()
        )
    vals = [recalls[n] for n in sorted(recalls)]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:])), recalls
    assert recalls[K_CELLS] >= 0.98, recalls
    assert recalls[1] > 0.0, recalls


def test_ivf_inverted_file_prunes_and_matches(spark, tmpdir_scratch):
    """The on-disk inverted file must (a) return the same top-k as the
    in-memory IVF, (b) be probed with dynamic partition pruning — the
    scan must not touch unprobed cells."""
    from ocr_application_spark.operators.ann_ivf import (
        ann_ivf_topk,
        build_inverted_file,
        probe_inverted_file,
    )

    sf = "/root/testdata/sf0.001"
    path = tmpdir_scratch + "/ivf"
    cent = build_inverted_file(spark, sf, path)
    disk = probe_inverted_file(spark, sf, path, cent)

    mem_rows = {
        (r.q_id, r.cand_id, r.rank) for r in ann_ivf_topk(spark, sf).collect()
    }
    disk_rows = {(r.q_id, r.cand_id, r.rank) for r in disk.collect()}
    assert disk_rows == mem_rows

    executed = disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in executed, executed


def test_inverted_file_append_equals_one_shot_build(spark, tmpdir_scratch):
    """Incremental IVF ingest: building the inverted file from half the
    vectors and appending the other half (same codebook, no retrain)
    must probe EXACTLY like the one-shot build — the probe path is
    oblivious to which commit wrote a row."""
    from pyspark.sql import functions as F

    from ocr_application_spark.operators.ann_ivf import (
        append_to_inverted_file,
        build_inverted_file,
        probe_inverted_file,
        train_codebook,
    )

    sf = SF
    full_path = tmpdir_scratch + "/ivf_full"
    incr_path = tmpdir_scratch + "/ivf_incr"
    cent = build_inverted_file(spark, sf, full_path)  # deterministic train
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    build_inverted_file(
        spark, sf, incr_path, vectors=e.filter(F.col("vec_id") % 2 == 0), cent=cent
    )
    append_to_inverted_file(spark, incr_path, cent, e.filter(F.col("vec_id") % 2 == 1))

    key = lambda rows: {(r.q_id, r.cand_id, r.rank) for r in rows}
    got_full = key(probe_inverted_file(spark, sf, full_path, cent).collect())
    got_incr = key(probe_inverted_file(spark, sf, incr_path, cent).collect())
    assert got_full == got_incr and len(got_full) > 0


def test_multiprobe_superset_of_single_probe(spark):
    """The Hamming-1 multiprobe near-dup pairs must be a strict superset
    of the single-probe pairs on the fixture (the probe list CONTAINS
    the identity probe), with each pair emitted exactly once — the
    no-distinct-needed claim in the operator docstring."""
    from ocr_application_spark.operators.similarity import (
        emb_neardup_multiprobe,
        emb_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    # collect once per frame; every assertion is set algebra in Python
    # (a .count()/.exceptAll() per check would re-run the self-joins)
    single_rows = emb_neardup_pairs(spark, sf).select("vec_a", "vec_b").collect()
    multi_rows = emb_neardup_multiprobe(spark, sf).select("vec_a", "vec_b").collect()
    single = {(r.vec_a, r.vec_b) for r in single_rows}
    multi = {(r.vec_a, r.vec_b) for r in multi_rows}
    assert single <= multi  # superset
    assert len(multi) > len(single)  # the extra probes earn recall
    # exactly-once: no pair appears twice
    assert len(multi_rows) == len(multi)
    assert len(single_rows) == len(single)


def test_lsh_pair_recall_vs_bruteforce(spark):
    """Quantify the sign-LSH recall dial against brute-force ground
    truth (every pair with cos >= tau, computed by the SAME shared
    scorer with the bucket restriction neutralized): multiprobe must
    strictly improve on single-probe, and both are subsets of truth by
    construction (identical scoring, fewer candidates)."""
    from pyspark.sql import functions as F

    from ocr_application_spark.operators.similarity import (
        _bucketed,
        _emb,
        _scored_bucket_pairs,
        emb_neardup_multiprobe,
        emb_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    b = _bucketed(_emb(spark, sf))
    # constant bucket on both sides -> the equi-join degenerates to
    # all-pairs THROUGH the same scorer, so truth differs only in
    # candidate generation, never in scoring
    flat = b.withColumn("bucket", F.lit(0))
    truth = {
        (r.vec_a, r.vec_b)
        for r in _scored_bucket_pairs(flat, flat).select("vec_a", "vec_b").collect()
    }
    assert truth  # fixture must have above-tau pairs for recall to mean anything
    single = {
        (r.vec_a, r.vec_b)
        for r in emb_neardup_pairs(spark, sf).select("vec_a", "vec_b").collect()
    }
    multi = {
        (r.vec_a, r.vec_b)
        for r in emb_neardup_multiprobe(spark, sf).select("vec_a", "vec_b").collect()
    }
    assert single <= truth and multi <= truth  # same scorer, fewer candidates
    r_single, r_multi = len(single) / len(truth), len(multi) / len(truth)
    assert r_multi > r_single
    # fixture-pinned floor so a silent bucketing regression fails loud
    assert r_multi >= 0.10, (len(truth), r_single, r_multi)
