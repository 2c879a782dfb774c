"""Deterministic operator fixtures derived from the driver test tables.

The reference's record shapes (OCR text_regions, layout tables) are
re-derived from ``lineitem`` with pure integer arithmetic so the exact
same rows are constructible in Spark (DataFrame API, below) and in
DuckDB (CTE strings, used by ``oracle_sql``). This lets every F/W/J/A
operator from SURVEY.md §2 be value-checked against an independent
engine.

Shapes:
  regions(doc_id, region_id, conf, x0, y0, x1, y1, text, source, page)
    — mirrors extraction_service/app/ocr/extractor.py:101-105
  tables(doc_id, tx0, ty0, tx1, ty1)
    — mirrors the layout table bboxes of layout_detector.py:453-463
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    px = F.col("l_partkey") % 1000
    sx = F.col("l_suppkey") % 100
    x0 = (px % 37) * 25
    y0 = (sx % 29) * 12
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        F.col("l_linenumber").alias("region_id"),
        ((px % 101).cast("double") / 100.0).alias("conf"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + 8 + (px % 31) * 4).alias("x1"),
        (y0 + 6 + (sx % 13) * 3).alias("y1"),
        F.when(px % 41 == 0, F.lit("منطقة"))
        .when(px % 17 == 0, F.lit("a"))
        .otherwise(F.concat(F.lit("w"), px.cast("string")))
        .alias("text"),
        F.when(F.col("l_partkey") % 2 == 0, F.lit("paddle"))
        .otherwise(F.lit("craft"))
        .alias("source"),
        (F.col("l_quantity").cast("int") % 3).alias("page"),
    )


REGIONS_CTE = """
regions as (
  select l_orderkey as doc_id,
         l_linenumber as region_id,
         cast((l_partkey % 1000) % 101 as double) / 100.0 as conf,
         ((l_partkey % 1000) % 37) * 25 as x0,
         ((l_suppkey % 100) % 29) * 12 as y0,
         ((l_partkey % 1000) % 37) * 25 + 8 + ((l_partkey % 1000) % 31) * 4 as x1,
         ((l_suppkey % 100) % 29) * 12 + 6 + ((l_suppkey % 100) % 13) * 3 as y1,
         case when (l_partkey % 1000) % 41 = 0 then 'منطقة'
              when (l_partkey % 1000) % 17 = 0 then 'a'
              else 'w' || cast(l_partkey % 1000 as varchar) end as text,
         case when l_partkey % 2 = 0 then 'paddle' else 'craft' end as source,
         cast(l_quantity as int) % 3 as page
  from lineitem
)
"""


def tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(F.col("l_linenumber") == 1)
    px = F.col("l_partkey") % 1000
    sx = F.col("l_suppkey") % 100
    tx0 = (px % 11) * 80
    ty0 = (sx % 7) * 40
    return li.select(
        F.col("l_orderkey").alias("doc_id"),
        tx0.alias("tx0"),
        ty0.alias("ty0"),
        (tx0 + 240).alias("tx1"),
        (ty0 + 120).alias("ty1"),
    )


TABLES_CTE = """
tables as (
  select l_orderkey as doc_id,
         ((l_partkey % 1000) % 11) * 80 as tx0,
         ((l_suppkey % 100) % 7) * 40 as ty0,
         ((l_partkey % 1000) % 11) * 80 + 240 as tx1,
         ((l_suppkey % 100) % 7) * 40 + 120 as ty1
  from lineitem where l_linenumber = 1
)
"""
