"""spark-submit entrypoint for the corpus-curation pipeline.

The companion to jobs/extract_job.py: extract_job turns raw crawled
pages into a text corpus; THIS job turns that corpus into training
data. It composes the oracle-verified curation operators into the
decision chain a real pretraining pipeline ships —

    clean (language + quality + exact-dup survivor)   operators/textfns.py
    -> Gopher repetition gates                        operators/curation.py
    -> frequency-rank (perplexity-analog) quality     operators/curation.py
    -> PII scrub (email/phone/IPv4 redaction)         same regex trio as
                                                      curation.text_pii_scrub
    -> deterministic train/valid/test holdout         md5-hex coin, same
                                                      discipline as
                                                      urlops.url_holdout_split

— writes the curated corpus partitioned by split, and prints one JSON
metrics line per stage (rows_in, rows_out, dropped) plus a final
summary line, so a 100 TB run leaves an auditable funnel.

Packaged run::

    bash scripts/package.sh
    spark-submit --master <cluster> \\
        --py-files dist/ocr_application_spark.zip \\
        jobs/curate_job.py --input <dir-with-documents.parquet> \\
        --output /path/curated

Scale shape: every stage is the operator's own plan (corpus-level
aggregates partial-aggregated map-side, the V-row rank vocabulary
broadcast, zero UDFs); the per-stage verdicts join back on doc_id —
co-partitioned equi-joins on the table's natural key. The funnel
counts are one count() action per stage over an already-persisted
verdict frame, not extra recomputes of the chain.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F


def curate(spark, input_dir: str):
    """Return (curated DataFrame, stage-metrics list). ``input_dir``
    must contain documents.parquet (the input_hint documents shape)."""
    from ocr_application_spark.operators.curation import (
        _RE_EMAIL,
        _RE_IP,
        _RE_PHONE,
        text_gopher_repetition,
        text_rank_quality,
    )
    from ocr_application_spark.operators.textfns import corpus_clean_pipeline

    docs = spark.read.parquet(f"{input_dir}/documents.parquet")
    rows_in = docs.count()
    metrics = []

    def gate(name: str, verdicts, prev, keep_col: str = "keep"):
        """Keep prev's docs whose verdict row has keep_col true. The
        surviving id set is persisted (it is doc_id-only and shrinks
        monotonically) so the funnel count and the next stage reuse it
        instead of re-running every earlier stage's aggregates."""
        keep = verdicts.filter(F.col(keep_col)).select("doc_id")
        out = prev.join(keep, "doc_id").persist()
        n_prev = metrics[-1]["rows_out"] if metrics else rows_in
        n_out = out.count()  # materializes the persist
        prev.unpersist()
        metrics.append(
            {"stage": name, "rows_in": n_prev, "rows_out": n_out,
             "dropped": n_prev - n_out}
        )
        return out

    cur = docs.select("doc_id")
    cur = gate("clean_lang_quality_dedup", corpus_clean_pipeline(spark, input_dir),
               cur, keep_col="kept")
    cur = gate("gopher_repetition", text_gopher_repetition(spark, input_dir), cur)
    cur = gate("rank_quality", text_rank_quality(spark, input_dir), cur)

    # PII scrub rewrites the surviving text in place (same fixed
    # email -> phone -> IP order as the oracle-checked operator)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE, "<PHONE>"),
        _RE_IP, "<IP>")

    # deterministic holdout: pure function of doc_id, any engine / any
    # partitioning / any re-run lands every doc in the same split
    coin = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    split = (
        F.when(coin < "e6666666", "train")
        .when(coin < "f3333333", "valid")
        .otherwise("test")
    )

    curated = (
        docs.join(cur, "doc_id")
        .select(
            "doc_id",
            scrubbed.alias("text"),
            "lang",
            "source",
            F.length(scrubbed).alias("n_chars"),
            split.alias("split"),
        )
    )
    return curated, metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from ocr_application_spark.session import get_spark

    spark = get_spark("curate_job")
    try:
        curated, metrics = curate(spark, args.input)
        (
            curated.write.mode("overwrite")
            .partitionBy("split")
            .parquet(args.output)
        )
        out = spark.read.parquet(args.output)
        by_split = {r["split"]: r["n"] for r in
                    out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        for m in metrics:
            print(json.dumps(m))
        print(json.dumps({"stage": "write", "rows_out": sum(by_split.values()),
                          "by_split": by_split, "output": args.output}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
