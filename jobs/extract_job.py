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
    ap.add_argument(
        "--snapshot-input",
        default=None,
        help="snapshot table (sources/snapshots.py layout): processes the "
        "diff since the last ingested version (watermark kept next to the "
        "lineage), so repeated runs are O(new data)",
    )
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
    sources = [x for x in (args.input, args.synth, args.snapshot_input) if x is not None]
    if len(sources) != 1:
        raise SystemExit("exactly one of --input / --synth / --snapshot-input is required")

    out_path, lin_path = args.output, args.lineage
    state_path = None
    current_v = None
    if args.synth is not None:
        pages = synth_pages(spark, args.synth)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        # Incremental ingest: watermark file records the last fully
        # ingested snapshot version. Each ingested version writes its
        # own ingest_v= shard — bucket-level dynamic-overwrite commits
        # are idempotent WITHIN a version but would clobber earlier
        # versions' rows in the same bucket if shards were mixed;
        # readers scan the output root and see ingest_v as a partition
        # column. Intra-run crashes resume by bucket (lineage), inter-
        # run increments advance by snapshot version.
        import json
        import os

        from ocr_application_spark.sources.snapshots import (
            read_snapshot,
            read_snapshot_diff,
            snapshot_versions,
        )

        versions = snapshot_versions(args.snapshot_input)
        if not versions:
            raise SystemExit(f"no snapshots at {args.snapshot_input}")
        current_v = versions[-1]
        state_path = os.path.join(args.lineage, "_ingest_state.json")
        processed = None
        if os.path.exists(state_path):
            with open(state_path) as fh:
                processed = int(json.load(fh)["processed_version"])
        if processed == current_v:
            print(f"extract_job: already at snapshot v{current_v}, nothing to do")
            spark.stop()
            return
        if processed is None:
            pages = read_snapshot(spark, args.snapshot_input, current_v)
        else:
            pages = read_snapshot_diff(spark, args.snapshot_input, processed, current_v)
        pages = pages.select("url", "warc_ts", "html", "text", "lang")
        out_path = f"{args.output}/ingest_v={current_v}"
        lin_path = f"{args.lineage}/ingest_v={current_v}"

    lin = run_to_table(
        pages,
        spark,
        out_path,
        lin_path,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        by_class=args.by_class,
    )
    done = lin.count()
    if state_path is not None:
        # advance the watermark only after every bucket committed
        import json
        import os

        os.makedirs(args.lineage, exist_ok=True)
        tmp = state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"processed_version": current_v}, fh)
        os.replace(tmp, state_path)
    print(f"extract_job: committed {done} buckets -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
