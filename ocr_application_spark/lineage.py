"""Per-partition lineage + checkpoint-resume.

North-rule requirement: per-partition lineage rows
``(partition_id, rows_in, rows_out, digest, wall_ms)`` written to a
metrics table, enabling checkpoint-resume of unfinished buckets. The
reference's analog is commit-offset-only-on-success
(extraction_service/app/kafka/consumer.py:44-46) plus MLflow counters
(layout_detection_service/app/mlflow/mlflow_client.py:23-34).

Design: the unit of restart is the stable url-hash *bucket* (not the
ephemeral Spark partition id — task ids change between runs, bucket ids
do not). The per-bucket digest is an order-insensitive fold of row
digests: the 60-bit value of each row-sha256's first 15 hex digits,
summed in decimal (ANSI mode cannot overflow a decimal(38)) and reduced
mod 2^63. A sum is multiset-sensitive where XOR is not — two identical
rows XOR to zero and vanish, a sum counts them — so duplicate-row
corruption changes the digest. ``wall_ms`` is the max batch wall time
observed in the bucket (scheduling-dependent, informational only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ("bucket", "rows_in", "rows_out", "digest", "wall_ms")


def bucket_lineage(extracted: DataFrame) -> DataFrame:
    """Aggregate lineage per url-hash bucket from the extraction output."""
    return (
        extracted.groupBy("bucket")
        .agg(
            F.count("*").alias("rows_in"),
            F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias("rows_out"),
            # order-insensitive fold of per-row sha256 prefixes: decimal
            # sum (no ANSI overflow at any row count that fits 10^25
            # rows) mod 2^63, multiset-sensitive unlike bit_xor (where
            # any even number of identical rows cancels to nothing)
            F.format_string(
                "%016x",
                F.expr(
                    "cast(pmod(sum(cast(conv(substring(digest, 1, 15), 16, 10)"
                    " as decimal(38,0))),"
                    " cast('9223372036854775808' as decimal(38,0))) as long)"
                ),
            ).alias("digest"),
            F.max("batch_wall_ms").alias("wall_ms"),
        )
    )


def write_lineage(lineage: DataFrame, path: str) -> None:
    lineage.select(*LINEAGE_COLS).coalesce(1).write.mode("append").parquet(path)


def finished_buckets(spark: SparkSession, lineage_path: str) -> DataFrame:
    """Buckets recorded complete in the lineage table (empty if none)."""
    if not _exists(lineage_path):
        return spark.range(0).selectExpr("cast(id as int) as bucket")
    return spark.read.parquet(lineage_path).select("bucket").distinct()


def resume_filter(pages_with_bucket: DataFrame, spark: SparkSession, lineage_path: str) -> DataFrame:
    """Skip already-finished buckets (checkpoint-resume).

    The finished set is bounded by n_buckets (one row each), so it is
    collected and applied as a NOT IN *filter* rather than an anti-join:
    a static predicate lets the parquet scan partition-prune finished
    ``bucket=`` directories entirely — a resume over a mostly-done
    10^12-row table then reads only the unfinished slice instead of
    rescanning everything.
    """
    done = [r.bucket for r in finished_buckets(spark, lineage_path).collect()]
    if not done:
        return pages_with_bucket
    return pages_with_bucket.filter(~F.col("bucket").isin(done))


def _exists(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ) if os.path.isdir(path) else os.path.exists(path)
