"""Web-page table source/sink.

At production scale the input is an Iceberg table of Common-Crawl pages
(north_rule); in this sandbox there is no Iceberg jar, so the table API
is parquet with the same shape: ``write_pages`` partitions by url-hash
bucket (the Iceberg ``bucket(N, url)`` analog — S7,
classification_service/app/Kafka/topic_manager.py:10-37 idempotent DDL),
and ``read_pages`` is a plain columnar scan that Catalyst prunes.

Synthetic generation runs *inside Spark* (mapInPandas over spark.range):
embarrassingly parallel, zero shuffle, so datagen itself scales with the
cluster.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_application_spark.datagen.webgen import gen_page

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
PAGES_SCHEMA_LABELED = PAGES_SCHEMA + ", true_class string"


def synth_pages(
    spark: SparkSession, n: int, with_label: bool = False, slices: int | None = None
) -> DataFrame:
    """Deterministic distributed page generation (input_hint schema)."""
    if slices is None:
        slices = max(8, spark.sparkContext.defaultParallelism)

    cols = ["url", "warc_ts", "html", "text", "lang"] + (
        ["true_class"] if with_label else []
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page(int(i)) for i in pdf["id"]]
            yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    rng = spark.range(0, n, numPartitions=slices)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA_LABELED if with_label else PAGES_SCHEMA)


def with_bucket(df: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Stable url-hash bucket column — the unit of checkpoint-resume.

    ``xxhash64`` is Spark-native and deterministic across runs/clusters,
    mirroring Iceberg's bucket transform (north_rule: "explicitly
    partitioned by url-hash buckets").

    If the input already carries a ``bucket`` column (a table written by
    ``write_pages``), it is KEPT, not recomputed: the values are
    identical by construction, and recomputing via withColumn would
    replace the *partition column* with a derived expression — after
    which resume_filter's NOT-IN predicate could no longer
    partition-prune finished ``bucket=`` directories and a resume would
    rescan the whole table. (Callers must pass the same n_buckets the
    table was written with; write_pages owns that invariant.)
    """
    if "bucket" in df.columns:
        return df
    return df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


def write_pages(df: DataFrame, path: str, n_buckets: int = 64, mode: str = "overwrite") -> None:
    (
        with_bucket(df, n_buckets)
        .repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def default_scratch() -> str:
    return os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")
