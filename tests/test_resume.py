"""Checkpoint-resume invariance (north_rule): kill after k buckets →
rerun → identical output, no bucket processed twice."""

from pyspark.sql import functions as F

from ocr_application_spark.pipeline import run_to_table
from ocr_application_spark.sources.webpages import synth_pages, with_bucket

N = 600
NB = 8


def test_partial_then_resume_completes(spark, tmpdir_scratch):
    out, lin = tmpdir_scratch + "/out", tmpdir_scratch + "/lineage"
    pages = synth_pages(spark, N)

    # simulate a crash after half the buckets committed
    half = with_bucket(pages, NB).filter(F.col("bucket") < NB // 2).drop("bucket")
    run_to_table(half, spark, out, lin, n_buckets=NB)
    n_half = spark.read.parquet(out).count()
    assert 0 < n_half < N

    # resume over the full input: only unfinished buckets run
    lin2 = run_to_table(pages, spark, out, lin, n_buckets=NB)
    done_now = {r.bucket for r in lin2.select("bucket").collect()}
    assert done_now == set(range(NB // 2, NB))

    full = spark.read.parquet(out)
    assert full.count() == N
    assert full.select("url").distinct().count() == N  # no bucket ran twice

    # idempotent: a third run processes nothing
    lin3 = run_to_table(pages, spark, out, lin, n_buckets=NB)
    assert lin3.count() == 0
    assert spark.read.parquet(out).count() == N


def test_resume_digests_match_single_run(spark, tmpdir_scratch):
    out, lin = tmpdir_scratch + "/out", tmpdir_scratch + "/lineage"
    out2 = tmpdir_scratch + "/out_single"
    pages = synth_pages(spark, 300)

    half = with_bucket(pages, NB).filter(F.col("bucket") < 3).drop("bucket")
    run_to_table(half, spark, out, lin, n_buckets=NB)
    run_to_table(pages, spark, out, lin, n_buckets=NB)

    run_to_table(pages, spark, out2, tmpdir_scratch + "/lin2", n_buckets=NB, resume=False)

    a = {(r.url, r.digest) for r in spark.read.parquet(out).select("url", "digest").collect()}
    b = {(r.url, r.digest) for r in spark.read.parquet(out2).select("url", "digest").collect()}
    assert a == b


def test_crash_before_lineage_commit_replays_without_duplicates(spark, tmpdir_scratch):
    """The crash window between the data write and the lineage write must
    be safe: the replayed buckets dynamically OVERWRITE their partitions
    (never append), so the rerun yields exactly one row per url."""
    import shutil

    out, lin = tmpdir_scratch + "/out_crash", tmpdir_scratch + "/lin_crash"
    pages = synth_pages(spark, N)
    run_to_table(pages, spark, out, lin, n_buckets=NB)
    shutil.rmtree(lin)  # crash simulation: data landed, lineage commit lost

    lin2 = run_to_table(pages, spark, out, lin, n_buckets=NB)
    assert lin2.count() == NB  # everything replays (no lineage survived)
    full = spark.read.parquet(out)
    assert full.count() == N
    assert full.select("url").distinct().count() == N  # replaced, not appended


def test_prewritten_bucket_table_resume_prunes_partitions(spark, tmpdir_scratch):
    """A table written partitionBy(bucket) keeps its partition column
    through with_bucket, so resume's NOT-IN predicate partition-prunes
    finished bucket= directories at the scan."""
    import contextlib
    import io
    import re

    from ocr_application_spark.sources.webpages import read_pages, write_pages

    src = tmpdir_scratch + "/pages_bucketed"
    write_pages(synth_pages(spark, N), src, n_buckets=NB)
    pages = read_pages(spark, src)
    assert "bucket" in pages.columns

    out, lin = tmpdir_scratch + "/out_pp", tmpdir_scratch + "/lin_pp"
    # finish half the buckets, then look at the resume scan's plan
    half = pages.filter(F.col("bucket") < NB // 2)
    run_to_table(half, spark, out, lin, n_buckets=NB)

    from ocr_application_spark.lineage import resume_filter

    remaining = resume_filter(pages, spark, lin)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        remaining.explain("formatted")
    plan = buf.getvalue()
    # the bucket NOT-IN predicate must reach PartitionFilters (scan-level
    # directory pruning), not sit above the scan as a post-filter
    m = re.search(r"PartitionFilters: \[([^\]]*)", plan)
    assert m and "bucket" in m.group(1), plan
    assert remaining.count() == spark.read.parquet(src).filter(
        F.col("bucket") >= NB // 2
    ).count()


def test_bucket_validation_guards(spark, tmpdir_scratch):
    """with_bucket must refuse bucket columns it can't vouch for: an
    unbranded column of unknown provenance, or a branded count that
    disagrees with the caller's — either would silently corrupt
    resume/lineage keying (ADVICE r01)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ocr_application_spark.sources.webpages import read_pages, write_pages

    pages = synth_pages(spark, 50)

    # unknown provenance: a pre-existing bucket column not from read_pages
    rogue = pages.withColumn("bucket", F.lit(3))
    with _pytest.raises(ValueError, match="unknown provenance"):
        with_bucket(rogue, NB)

    # branded table read back: accepted at the written count...
    src = tmpdir_scratch + "/pages"
    write_pages(pages, src, n_buckets=NB)
    branded = read_pages(spark, src)
    assert with_bucket(branded, NB).schema["bucket"].metadata["n_buckets"] == NB
    # ...rejected at any other count
    with _pytest.raises(ValueError, match="n_buckets"):
        with_bucket(branded, NB * 2)


def test_brand_bucket_migration_path(spark):
    """Pre-sidecar tables migrate via brand_bucket: the caller vouches
    for the count, after which with_bucket accepts the column."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ocr_application_spark.sources.webpages import brand_bucket

    pages = synth_pages(spark, 20).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(NB)).cast("int")
    )
    with _pytest.raises(ValueError, match="provenance"):
        with_bucket(pages, NB)
    branded = brand_bucket(pages, NB)
    assert with_bucket(branded, NB).schema["bucket"].metadata["n_buckets"] == NB
    with _pytest.raises(ValueError, match="n_buckets"):
        with_bucket(branded, NB * 2)
    with _pytest.raises(ValueError, match="existing"):
        brand_bucket(pages.drop("bucket"), NB)
