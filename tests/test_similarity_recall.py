"""IVF recall vs the exact brute-force oracle."""

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_ivf_recall_against_brute_force(spark):
    Q = entrymod.queries()
    exact = Q["ann_cosine_topk"](spark, SF).collect()
    ivf = Q["ann_ivf_topk"](spark, SF).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.q_id, set()).add(r.cand_id)
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r.q_id, set()).add(r.cand_id)
    assert set(ivf_sets) == set(exact_sets)  # every query answered
    hits = sum(len(exact_sets[q] & ivf_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    recall = hits / total
    # random 64-d corpus is the worst case for IVF; probing 4/16 cells
    # must still find a substantial share of true top-5
    assert recall >= 0.35, f"IVF recall {recall:.2f}"


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
