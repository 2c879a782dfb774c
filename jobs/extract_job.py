"""spark-submit entrypoint for the extraction pipeline.

Packaged run (north_star: "packaged for spark-submit --py-files")::

    bash scripts/package.sh   # builds dist/ocr_application_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/ocr_application_spark.zip \\
        jobs/extract_job.py \\
        --input /path/to/pages_table --output /path/out \\
        --lineage /path/lineage --buckets 4096

On a cluster the session comes from spark-submit's conf; this script
only adds the app-level SQL tuning. ``--synth N`` generates the input
on the fly (smoke mode, no external data).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="pages table path (input_hint schema)")
    ap.add_argument("--synth", type=int, default=None, help="generate N synthetic pages instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--by-class", action="store_true", help="partition output by doc_class too (S4)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_application_spark.pipeline import run_to_table
    from ocr_application_spark.sources.webpages import synth_pages

    spark = (
        SparkSession.builder.appName("ocr_application_spark.extract")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )
    if args.synth is not None and args.input is not None:
        raise SystemExit("--input and --synth are mutually exclusive")
    if args.synth is not None:
        pages = synth_pages(spark, args.synth)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input / --synth is required")

    lin = run_to_table(
        pages,
        spark,
        args.output,
        args.lineage,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        by_class=args.by_class,
    )
    done = lin.count()
    print(f"extract_job: committed {done} buckets -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
