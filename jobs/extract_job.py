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
on the fly (smoke mode, no external data). ``--snapshot-input`` ingests
a snapshot table incrementally (see _run_snapshot_ingest).
"""

from __future__ import annotations

import argparse
import json
import os


def _read_state(state_path: str) -> dict:
    if os.path.exists(state_path):
        with open(state_path) as fh:
            return json.load(fh)
    return {}


def _write_state(state_path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(state_path), exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, state_path)


def _run_snapshot_ingest(spark, args) -> None:
    """Incremental ingest of a snapshot table, one version step at a
    time. The watermark file records the last FULLY ingested version
    plus the version currently being ingested, so a crash retries the
    SAME target version (its shard's bucket-level resume completes the
    partial work) even if the source has moved on — no shard is ever
    orphaned with its rows duplicated into a later shard. Each ingested
    version writes its own ``ingest_v=`` shard (bucket-level dynamic-
    overwrite commits are idempotent WITHIN a version but would clobber
    earlier versions' rows if shards were mixed); readers scan the
    output root and see ingest_v as a partition column. Quarantine rows
    route to a sibling root OUTSIDE the scanned output."""
    from ocr_application_spark.pipeline import run_to_table
    from ocr_application_spark.sources.snapshots import (
        read_snapshot,
        read_snapshot_diff,
        snapshot_versions,
    )

    tbl = args.snapshot_input
    versions = snapshot_versions(tbl)
    if not versions:
        raise SystemExit(f"no snapshots at {tbl}")
    latest = versions[-1]
    state_path = os.path.join(args.lineage, "_ingest_state.json")
    state = _read_state(state_path)
    processed = state.get("processed_version")

    if args.rebaseline is not None:
        # operator escape hatch after source rewrite/expiry: declare a
        # snapshot already-ingested without processing. Rebaselining AT
        # the rewrite commit (not blindly at latest) lets the normal
        # step loop ingest any appends that follow it — jumping to
        # latest would silently skip them.
        if state.get("in_progress") is not None:
            raise SystemExit(
                f"refusing to rebaseline: ingest of v{state['in_progress']} "
                "is in flight (a partially-written shard would be orphaned "
                "in the output root). Run once WITHOUT --rebaseline to "
                "finish it, or remove the partial "
                f"ingest_v={state['in_progress']} shard and lineage dir "
                "before rebaselining."
            )
        base_v = latest if args.rebaseline == -1 else args.rebaseline
        if base_v not in versions:
            raise SystemExit(
                f"cannot rebaseline at v{base_v}: not in {versions}"
            )
        _write_state(state_path, {"processed_version": base_v})
        print(f"extract_job: rebaselined watermark at v{base_v} (no processing)")
        return

    for label, v in (("watermarked", processed), ("in-flight", state.get("in_progress"))):
        if v is not None and v not in versions:
            raise SystemExit(
                f"{label} snapshot v{v} no longer exists at {tbl} "
                f"(have {versions}) — the source was expired or recreated. "
                "Either re-ingest fully into a fresh --output, or run with "
                "--rebaseline [VERSION] to declare a snapshot already "
                "ingested (then clean any partial shard by hand)."
            )

    from ocr_application_spark.sources.snapshots import snapshot_info

    n_steps = 0
    while True:
        versions = snapshot_versions(tbl)
        latest = versions[-1]
        if processed == latest and state.get("in_progress") is None:
            break
        # resume a crashed step's exact target; otherwise batch the
        # CONTIGUOUS run of append/overwrite commits after the watermark
        # into one diff (one Spark job, one shard — not a shard per tiny
        # crawl commit), stopping before any rewrite commit. A "compact"
        # rewrite is content-preserving, so the watermark just advances
        # over it with nothing to process.
        target = state.get("in_progress")
        if target is None:
            if processed is None:
                target = latest  # first ingest: full read of the latest
            else:
                nxt = min(v for v in versions if v > processed)
                info = snapshot_info(tbl, nxt)
                # decisions key off the commit MODE; the only rewrite a
                # watermark may silently cross is the content-preserving
                # one, identified by the reserved "compact" label
                if info["mode"] == "replace_all" and info["operation"] == "compact":
                    processed = nxt
                    _write_state(state_path, {"processed_version": processed})
                    print(f"extract_job: skipped compaction commit v{nxt}")
                    continue
                target = nxt
                for v in sorted(v for v in versions if v > nxt):
                    # stop before any content-rewriting commit (full
                    # rewrite or copy-on-write merge) — diffs across
                    # them are refused by read_snapshot_diff
                    if snapshot_info(tbl, v)["mode"] in ("replace_all", "merge"):
                        break
                    target = v
        try:
            if processed is None:
                pages = read_snapshot(spark, tbl, target)
            else:
                pages = read_snapshot_diff(spark, tbl, processed, target)
        except ValueError as exc:  # replace_all in range / inverted
            v_hint = str(exc).split("commit v")[-1].split(" ")[0].rstrip(",")
            raise SystemExit(
                f"cannot ingest incrementally: {exc}. Re-ingest fully into "
                f"a fresh --output, or run with --rebaseline {v_hint} and "
                "continue stepping from there."
            ) from exc
        pages = pages.select("url", "warc_ts", "html", "text", "lang")
        state = {"processed_version": processed, "in_progress": target}
        _write_state(state_path, state)
        lin = run_to_table(
            pages,
            spark,
            f"{args.output}/ingest_v={target}",
            f"{args.lineage}/ingest_v={target}",
            n_buckets=args.buckets,
            resume=not args.no_resume,
            by_class=args.by_class,
            quarantine_path=f"{args.output}_quarantine/ingest_v={target}",
        )
        done = lin.count()
        processed = target
        state = {"processed_version": processed}
        _write_state(state_path, state)
        n_steps += 1
        print(
            f"extract_job: committed {done} buckets -> "
            f"{args.output}/ingest_v={target}"
        )
    if n_steps == 0:
        print(f"extract_job: already at snapshot v{latest}, nothing to do")


def stage_warc_input(spark, segments_dir: str, staged_dir: str, n_buckets: int) -> str:
    """Convert a raw WARC response segment drop folder (seg, payload —
    sources/warc.py shape) into a bucket-branded pages table at
    ``staged_dir``, quarantining malformed records from the SAME parse
    pass (cf. curate_job.stage_wet_input). Returns the pages path."""
    from pyspark.sql import functions as F

    from ocr_application_spark.sources.warc import parse_warc_segments, warc_to_pages
    from ocr_application_spark.sources.webpages import write_pages

    parsed = parse_warc_segments(spark.read.parquet(segments_dir)).persist()
    try:
        pages_path = f"{staged_dir}/pages"
        write_pages(warc_to_pages(parsed), pages_path, n_buckets=n_buckets)
        # quarantine keeps the malformed rows' offsets, not bodies (a
        # malformed record has no trustworthy body to keep)
        parsed.where(F.col("status") != "ok").drop("body").write.mode(
            "overwrite"
        ).parquet(f"{staged_dir}/quarantine.parquet")
        n_all = parsed.count()
        n_ok = spark.read.parquet(pages_path).count()
    finally:
        parsed.unpersist()
    print(json.dumps({"stage": "warc_ingest", "records": n_all,
                      "rows_out": n_ok, "malformed": n_all - n_ok,
                      "staged": staged_dir}))
    return pages_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="pages table path (input_hint schema), or a raw WARC response segment table with --input-format warc")
    ap.add_argument("--input-format", default="pages", choices=("pages", "warc"),
                    help="'warc': --input is a packed response-segment table "
                         "(sources/warc.py shape); it is parsed, quarantined "
                         "and staged as a bucket-branded pages table under "
                         "--output before extraction runs")
    ap.add_argument(
        "--snapshot-input",
        default=None,
        help="snapshot table (sources/snapshots.py layout): ingests one "
        "snapshot version step at a time since the watermark kept next to "
        "the lineage, so repeated runs are O(new data)",
    )
    ap.add_argument("--synth", type=int, default=None, help="generate N synthetic pages instead")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--by-class", action="store_true", help="partition output by doc_class too (S4)")
    ap.add_argument(
        "--rebaseline",
        nargs="?",
        type=int,
        const=-1,
        default=None,
        metavar="VERSION",
        help="snapshot mode only: set the watermark to VERSION (default: "
        "latest) WITHOUT processing — recovery after a source rewrite or "
        "expiry. Rebaseline AT the rewrite commit so later appends still "
        "ingest incrementally.",
    )
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
    sources = [
        x for x in (args.input, args.synth, args.snapshot_input) if x is not None
    ]
    if len(sources) != 1:
        raise SystemExit("exactly one of --input / --synth / --snapshot-input is required")

    if args.snapshot_input is not None:
        _run_snapshot_ingest(spark, args)
        spark.stop()
        return
    if args.synth is not None:
        pages = synth_pages(spark, args.synth)
    else:
        # read_pages, not raw spark.read.parquet: a table written by
        # write_pages carries a bucket column whose provenance lives in
        # the _bucket_meta.json sidecar — without the brand, resume's
        # with_bucket rejects it. Plain tables read through unchanged.
        from ocr_application_spark.sources.webpages import read_pages

        input_path = args.input
        if args.input_format == "warc":
            input_path = stage_warc_input(
                spark, args.input, args.output.rstrip("/") + "_warc_staged",
                args.buckets,
            )
        pages = read_pages(spark, input_path)

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
