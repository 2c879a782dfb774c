"""Benchmark entry point (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall seconds across headline queries. Extra keys
report the north-rule numbers: extraction documents/sec and corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    # extraction corpus sized with sf (sf0.1 -> 20k docs)
    n_docs = max(2000, int(200_000 * sf_num))

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ocr_application_spark.pipeline import extract_pages
    from ocr_application_spark.session import get_spark
    from ocr_application_spark.sources.webpages import synth_pages

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(8, cpus))

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # --- flagship: extraction throughput (north-rule metric) --------------
    pages = synth_pages(spark, n_docs)
    t0 = time.monotonic()
    n_out = extract_pages(pages).filter(F.col("status") == "success").count()
    extract_secs = time.monotonic() - t0
    timings["extract_pipeline"] = round(extract_secs, 3)
    docs_per_sec = round(n_out / extract_secs, 1)

    # --- headline relational / dedup / similarity queries -----------------
    queries = entrymod.queries()
    headline = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_region_revenue",
        "w1_reading_order",
        "w2_line_sessionize",
        "j1_fuzzy_catalog_match",
        "j4_iou_dedup",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "text_quality_score",
        "ann_cosine_topk",
        "pipeline_extract_digest",
        "forecast_linear",
    ]
    for name in headline:
        fn = queries[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "extraction_docs_per_sec": docs_per_sec,
                "extraction_corpus_docs": n_out,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
