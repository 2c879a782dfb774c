"""export_job: determinism, packing invariants, manifest verification."""

import json
import os
import shutil

from pyspark.sql import functions as F

from jobs.export_job import budget_filter, export, plan_export, shard_manifest

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_packing_invariants_per_shard(spark):
    packed = plan_export(_docs(spark), n_shards=8, seq_len=512)
    packed.persist()
    try:
        # pos dense 1..N within each shard
        bad_pos = (
            packed.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
                 F.min("pos").alias("mn"),
                 F.count_distinct(F.col("pos")).alias("nd"))
            .where((F.col("mx") != F.col("n")) | (F.col("mn") != 1)
                   | (F.col("nd") != F.col("n")))
            .count()
        )
        assert bad_pos == 0
        # per-doc seq ids are consistent and the clamp holds
        bad_seq = packed.where(
            (F.col("n_seqs") != F.col("last_seq") - F.col("first_seq") + 1)
            | (F.col("first_seq") < 0) | (F.col("last_seq") < 0)
            | (F.col("n_seqs") < 1)
        ).count()
        assert bad_seq == 0
        # shard seq count == ceil(shard tokens / seq_len)
        bad_total = (
            packed.groupBy("shard")
            .agg(F.sum("n_tokens").alias("tok"), (F.max("last_seq") + 1).alias("ns"))
            .where(F.col("ns") != F.ceil(F.col("tok") / 512))
            .count()
        )
        assert bad_total == 0
    finally:
        packed.unpersist()


def test_manifest_deterministic_across_runs(spark):
    m1 = shard_manifest(plan_export(_docs(spark), n_shards=8))
    m2 = shard_manifest(plan_export(_docs(spark), n_shards=8))
    assert m1 == m2
    assert len(m1) == 8  # every shard populated at 500 docs


def test_fingerprint_is_order_sensitive(spark):
    packed = plan_export(_docs(spark), n_shards=4)
    base = shard_manifest(packed)
    # swapping two docs' positions within a shard must change that
    # shard's fingerprint (xor of position-tagged hashes)
    swapped = packed.withColumn(
        "pos",
        F.when(F.col("pos") == 1, F.lit(2).cast("long"))
        .when(F.col("pos") == 2, F.lit(1).cast("long"))
        .otherwise(F.col("pos")),
    )
    alt = shard_manifest(swapped)
    assert [s["fingerprint"] for s in alt] != [s["fingerprint"] for s in base]
    assert [s["n_tokens"] for s in alt] == [s["n_tokens"] for s in base]


def test_budget_filter_deterministic_and_bounded(spark):
    docs = _docs(spark)
    total = docs.select(F.sum(
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1)
    ).alias("t")).collect()[0]["t"]
    budget = total // 4
    kept1 = budget_filter(docs, budget)
    kept2 = budget_filter(docs, budget)
    ids1 = {r["doc_id"] for r in kept1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    assert ids1 == ids2  # the md5 coin, not RNG
    kt = kept1.select(F.sum(
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1)
    ).alias("t")).collect()[0]["t"]
    # expected-value sample: within 2x of the target either way at n=500
    assert budget / 2 <= kt <= budget * 2, (kt, budget)
    # a budget >= total keeps everything
    assert budget_filter(docs, total * 2).count() == docs.count()


def test_export_end_to_end_writes_verifiable_manifest(spark, tmp_path):
    out = str(tmp_path / "shards_out")
    m = export(spark, SF_DIR, out, n_shards=4, seq_len=256)
    assert m["n_docs_out"] == m["n_docs_in"] == 500
    with open(os.path.join(out, "manifest.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk == json.loads(json.dumps(m))
    # the manifest verifies against a fresh read of the written shards
    reread = shard_manifest(spark.read.parquet(os.path.join(out, "shards")))
    assert reread == m["shards"]
    shutil.rmtree(out, ignore_errors=True)
