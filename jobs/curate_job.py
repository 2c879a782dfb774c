"""spark-submit entrypoint for the corpus-curation pipeline.

The companion to jobs/extract_job.py: extract_job turns raw crawled
pages into a text corpus; THIS job turns that corpus into training
data. It composes the oracle-verified curation operators into the
decision chain a real pretraining pipeline ships —

    clean (language + quality + exact-dup survivor)   operators/textfns.py
    -> C4 word blocklist (opt-in)                     curation.word_blocklist_gate
    -> mixed-script drop (opt-in)                     unicode_norm.script_mix_cols
    -> C4 line rules (opt-in, rebuilds text)          curation.text_c4_line_filter
    -> Gopher quality rule card (opt-in)              curation.text_gopher_quality
    -> Gopher repetition gates                        operators/curation.py
    -> frequency-rank (perplexity-analog) quality     operators/curation.py
    -> CDC shared-chunk cap (opt-in)                  cdc.dedup_cdc_chunks
    -> PII scrub (email/phone/IPv4 redaction)         same regex trio as
                                                      curation.text_pii_scrub
    -> deterministic train/valid/test holdout         md5-hex coin, same
                                                      discipline as
                                                      urlops.url_holdout_split
    -> deterministic trainer shard assignment         curation.shard_coin/_of

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


#: default gate chain; "c4", "gopher_quality" and "lm" are opt-in dials —
#: the C4 line rules and the full Gopher rule card assume prose-shaped
#: text (terminal punctuation, English stop words) and the lm gate needs
#: a usable reference slice to train on, so a recipe flips them on per
#: corpus rather than eating a 100% kill rate on corpora they don't fit
#: (exactly how C4/MassiveText/CCNet pipelines stage their own gates).
DEFAULT_GATES = ("clean", "repetition", "rank")
ALL_GATES = (
    "clean", "blocklist", "script", "c4", "gopher_quality", "repetition",
    "rank", "cdc", "lm",
)


def _lm_verdicts(spark, docs, keep_quantile: float):
    """CCNet-proper perplexity gate (opt-in like c4/gopher_quality): an
    add-one bigram model trains on the corpus's lang='en' slice
    (operators/lm.py — at production scale, point it at a curated
    reference corpus instead) and a document survives if its per-bigram
    log-prob rate clears the corpus's ``keep_quantile`` percentile —
    a relative cut, so the dial is a kept-fraction, not a magic
    absolute threshold. Docs with <2 tokens can't be assessed and are
    dropped. Fails loud when the training slice is empty (e.g. a WET
    staging where lang is NULL) rather than silently killing the
    corpus with NULL scores."""
    from ocr_application_spark.operators.lm import bigram_lm_tables, score_documents

    big, ctx, vocab = bigram_lm_tables(docs)
    if vocab.collect()[0]["v_size"] == 0:
        raise ValueError(
            "lm gate: empty training slice (no lang='en' docs) — "
            "train on a reference corpus or skip the lm gate"
        )
    scored = score_documents(docs, big, ctx, vocab)
    rates = scored.where(F.col("n_bigrams") > 0).select(
        "doc_id",
        (F.col("lm_logprob_micro").cast("double") / F.col("n_bigrams")).alias("rate"),
    )
    thr = rates.agg(F.expr(f"percentile(rate, {keep_quantile})").alias("thr"))
    return rates.crossJoin(F.broadcast(thr)).withColumn(
        "keep", F.col("rate") >= F.col("thr")
    )

# the previous curate() call's surviving-id persist: the returned plan
# references it, so nothing else frees it — a long-lived session calling
# curate() repeatedly (tests, notebooks) would accumulate one cached id
# set per call (same leak class as the tarification_entry fix)
_last_cur = None


def curate(
    spark,
    input_dir: str,
    gates=DEFAULT_GATES,
    n_shards: int = 8,
    dedup_index: str | None = None,
    lm_keep_quantile: float = 0.25,
    cdc_max_shared_bp: int = 8000,
):
    """Return (curated DataFrame, stage-metrics list). ``input_dir``
    must contain documents.parquet (the input_hint documents shape).
    ``gates`` picks the decision chain (subset of ALL_GATES, order
    fixed); when "c4" is on, surviving documents are REBUILT from their
    surviving lines before the scrub.

    ``dedup_index`` (opt-in) makes exact dedup INCREMENTAL ACROSS RUNS:
    before any gate, the corpus is ingested against the persisted
    fingerprint index at that path (``operators/dedup.
    fingerprint_index_ingest`` — one snapshot commit, novel fps only)
    and only 'novel' docs continue down the funnel — a recrawl batch
    curated against last month's index drops last month's content
    without ever re-reading it. Replay-safe: re-running the SAME batch
    against the index it built reproduces the same survivor set."""
    from ocr_application_spark.operators.curation import (
        c4_kept_lines,
        pii_scrub,
        shard_coin,
        shard_of,
        text_c4_line_filter,
        text_gopher_quality,
        text_gopher_repetition,
        text_rank_quality,
    )
    from ocr_application_spark.operators.textfns import corpus_clean_pipeline

    unknown = set(gates) - set(ALL_GATES)
    if unknown:
        raise ValueError(f"unknown gates: {sorted(unknown)}")

    global _last_cur
    if _last_cur is not None:
        try:
            _last_cur.unpersist()
        except Exception:
            pass  # prior SparkSession already stopped
        _last_cur = None

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
    if dedup_index is not None:
        from ocr_application_spark.operators.dedup import fingerprint_index_ingest

        verdicts, _v = fingerprint_index_ingest(
            spark, dedup_index, docs, op_label="curate-ingest"
        )
        cur = gate(
            "incremental_dedup",
            verdicts.withColumn("keep", F.col("verdict") == "novel"),
            cur,
        )
    if "clean" in gates:
        cur = gate("clean_lang_quality_dedup",
                   corpus_clean_pipeline(spark, input_dir), cur,
                   keep_col="kept")
    if "blocklist" in gates:
        from ocr_application_spark.operators.curation import word_blocklist_gate

        cur = gate("word_blocklist", word_blocklist_gate(docs), cur)
    if "script" in gates:
        from ocr_application_spark.operators.unicode_norm import script_mix_cols

        _, _, _, mixed = script_mix_cols(F.col("text"))
        # NULL text => regexp_count(NULL) makes `mixed` NULL; coalesce
        # to keep=true (no text has no script mix) so the doc gets an
        # explicit verdict instead of a silent three-valued-filter drop
        # (ADVICE r04)
        cur = gate(
            "script_mix",
            docs.select("doc_id", F.coalesce(~mixed, F.lit(True)).alias("keep")),
            cur,
        )
    if "c4" in gates:
        cur = gate("c4_line_rules", text_c4_line_filter(spark, input_dir),
                   cur, keep_col="doc_keep")
    if "gopher_quality" in gates:
        cur = gate("gopher_quality", text_gopher_quality(spark, input_dir),
                   cur)
    if "repetition" in gates:
        cur = gate("gopher_repetition",
                   text_gopher_repetition(spark, input_dir), cur)
    if "rank" in gates:
        cur = gate("rank_quality", text_rank_quality(spark, input_dir), cur)
    if "cdc" in gates:
        from ocr_application_spark.operators.cdc import dedup_cdc_chunks

        # the chunk report has NO row for empty/NULL-text docs (nothing
        # to chunk); left-join it onto the full id set and default those
        # docs to keep=true (zero chunks => zero shared content) so they
        # get an explicit verdict instead of an inner-join drop
        # (ADVICE r04)
        cdc_verdicts = (
            docs.select("doc_id")
            .join(dedup_cdc_chunks(spark, input_dir), "doc_id", "left")
            .withColumn(
                "keep",
                F.coalesce(F.col("shared_bp") <= cdc_max_shared_bp, F.lit(True)),
            )
        )
        cur = gate("cdc_shared_chunks", cdc_verdicts, cur)
    if "lm" in gates:
        cur = gate("lm_perplexity", _lm_verdicts(spark, docs, lm_keep_quantile),
                   cur)

    # when the c4 gate ran, the shipped text is the line-filtered
    # reconstruction (kept lines rejoined in order) — the same bytes the
    # operator's oracle pins via sha256
    body = (
        F.array_join(c4_kept_lines(F.col("text")), "\n")
        if "c4" in gates
        else F.col("text")
    )

    # PII scrub rewrites the surviving text in place (pii_scrub IS the
    # oracle-checked operator's chain — shared expression, same order)
    scrubbed = pii_scrub(body)

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
            # trainer hand-off: deterministic shard from the shuffle
            # coin (pure function of doc_id — same spec as the
            # shard_shuffle operator), so re-runs regroup identically
            shard_of(shard_coin(F.col("doc_id")), n_shards).alias("shard"),
        )
    )
    _last_cur = cur
    return curated, metrics


def stage_wet_input(spark, segments_dir: str, staged_dir: str) -> dict:
    """Convert a WET segment drop folder into the documents shape the
    funnel consumes, materialized once at ``staged_dir`` (every gate
    re-reads the documents parquet, so staging is required, not waste).
    ONE parse pass (persisted) feeds both the staged documents and the
    quarantine table — the byte-level kernel never runs twice over the
    corpus for a metrics line. Returns the ingest metrics."""
    from ocr_application_spark.sources.warc import (
        parse_wet_segments,
        wet_to_documents,
    )

    parsed = parse_wet_segments(spark.read.parquet(segments_dir)).persist()
    try:
        wet_to_documents(parsed).write.mode("overwrite").parquet(
            f"{staged_dir}/documents.parquet"
        )
        parsed.where(F.col("status") != "ok").write.mode("overwrite").parquet(
            f"{staged_dir}/quarantine.parquet"
        )
        n_all = parsed.count()
        n_ok = spark.read.parquet(f"{staged_dir}/documents.parquet").count()
    finally:
        parsed.unpersist()
    return {"stage": "wet_ingest", "records": n_all, "rows_out": n_ok,
            "malformed": n_all - n_ok, "staged": staged_dir}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory containing documents.parquet (or WET "
                         "segment parquet with --input-format wet)")
    ap.add_argument("--input-format", default="documents",
                    choices=("documents", "wet"),
                    help="'wet': --input is a packed WET segment table "
                         "(sources/warc.py shape); it is parsed and staged "
                         "into the documents shape under --output before "
                         "the gates run")
    ap.add_argument("--output", required=True)
    ap.add_argument("--gates", default=",".join(DEFAULT_GATES),
                    help=f"comma list from {ALL_GATES} (order is fixed; "
                         "'c4' rebuilds text from surviving lines)")
    ap.add_argument("--shards", type=int, default=8,
                    help="trainer hand-off shard count (deterministic)")
    ap.add_argument("--lm-keep-quantile", type=float, default=0.25,
                    help="lm gate: drop docs whose per-bigram log-prob "
                         "rate is below this corpus percentile")
    ap.add_argument("--cdc-max-shared-bp", type=int, default=8000,
                    help="cdc gate: drop docs whose CDC shared-chunk "
                         "ratio exceeds this many basis points "
                         "(template-heavy near-copies)")
    ap.add_argument("--dedup-index", default=None,
                    help="persisted fingerprint-index path: dedupe this "
                         "batch against prior runs BEFORE the gates "
                         "(incremental exact dedup; index grows by this "
                         "batch's novel fingerprints)")
    args = ap.parse_args()

    from ocr_application_spark.session import get_spark

    spark = get_spark("curate_job")
    try:
        gates = tuple(g for g in args.gates.split(",") if g)
        input_dir = args.input
        pre_metrics = []
        if args.input_format == "wet":
            input_dir = args.output.rstrip("/") + "_wet_staged"
            pre_metrics.append(stage_wet_input(spark, args.input, input_dir))
        curated, metrics = curate(spark, input_dir, gates=gates,
                                  n_shards=args.shards,
                                  dedup_index=args.dedup_index,
                                  lm_keep_quantile=args.lm_keep_quantile,
                                  cdc_max_shared_bp=args.cdc_max_shared_bp)
        (
            curated.write.mode("overwrite")
            .partitionBy("split")
            .parquet(args.output)
        )
        out = spark.read.parquet(args.output)
        by_split = {r["split"]: r["n"] for r in
                    out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        for m in pre_metrics + metrics:
            print(json.dumps(m))
        print(json.dumps({"stage": "write", "rows_out": sum(by_split.values()),
                          "by_split": by_split, "output": args.output}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
