"""spark-submit entrypoint for training-shard export — the last mile.

extract_job makes a text corpus; curate_job makes training data; THIS
job makes the artifact a trainer actually consumes: deterministically
shuffled, sequence-packed, sharded parquet with a per-shard manifest a
training loop (and a re-run) can verify byte-for-byte. It composes the
oracle-verified primitives from ``operators/curation.py``:

    optional per-source token budget     sample_token_budget's coin rule
    -> deterministic shuffle             shard_coin/shard_of (md5, no RNG)
    -> concat-and-chunk packing          seq_pack's window (incl. the
                                         zero-token clamp)
    -> partitioned write + manifest      per-shard docs/tokens/seqs +
                                         an order-sensitive fingerprint

Everything is a pure function of doc_id and text: two runs over the
same input produce IDENTICAL shards and an identical manifest — which
is what makes the manifest a verification artifact, not a log line.
The fingerprint is ``bit_xor(xxhash64(doc_id, pos, n_tokens))``:
xor-combining position-tagged hashes is partitioning-independent yet
ORDER-SENSITIVE (a swapped pair changes two tags), and xor never
overflows under ANSI mode (the digest-fold discipline this repo pins).

Scale shape: one exchange for the budget's per-source totals (tiny,
broadcast back), one for the shard shuffle (the intended output
partitioning — the window, the write, and the manifest aggregation all
reuse it), zero UDFs, zero collects beyond the manifest's O(n_shards)
rows. Shard count is the trainer's data-parallel width, not a tuning
knob derived from cluster size.

Packaged run::

    spark-submit --master <cluster> \\
        --py-files dist/ocr_application_spark.zip \\
        jobs/export_job.py --input /path/curated --output /path/shards \\
        --shards 64 [--seq-len 512] [--token-budget N]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _n_tokens(text_col) -> F.Column:
    """Whitespace token count — the same integer expression
    sample_token_budget uses (spaces + 1)."""
    return (
        F.length(text_col)
        - F.length(F.replace(text_col, F.lit(" "), F.lit("")))
        + 1
    ).cast("long")


def budget_filter(docs: DataFrame, token_budget: int) -> DataFrame:
    """Expected-``token_budget``-token deterministic GLOBAL sample:
    keep rate = budget/corpus_total clamped to 1, drawn with the md5
    ':budget' coin (sample_token_budget's coin rule) so the SAME docs
    survive on any engine, partitioning, or re-run. Global on purpose —
    the trainer asks for N tokens total; per-source composition is the
    mixing ops' job (sample_domain_mix / sample_token_budget) upstream."""
    d = docs.withColumn("_nt", _n_tokens(F.col("text")))
    total = d.agg(F.sum("_nt").alias("_total"))
    coin = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":budget"))), 1, 8
    )
    # hex-string compare against the rate threshold in hex: lowercase
    # fixed-width hex orders identically to the integer it encodes
    thr = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.lit(2**32 - 1).cast("long"),
                    F.floor(
                        F.lit(float(token_budget))
                        * F.lit(2.0**32)
                        / F.col("_total").cast("double")
                    ).cast("long"),
                )
            )
        ),
        8,
        "0",
    )
    return (
        d.crossJoin(F.broadcast(total))
        .where(coin < thr)
        .drop("_nt", "_total")
    )


def plan_export(
    docs: DataFrame, n_shards: int = 64, seq_len: int = 512
) -> DataFrame:
    """The shuffled, packed export plan: (doc_id, shard, pos, n_tokens,
    first_seq, last_seq, n_seqs, text). pos is dense 1..N within a
    shard; sequence ids follow seq_pack's concat-and-chunk contract
    (incl. the greatest(cum-1, 0) zero-token clamp)."""
    from ocr_application_spark.operators.curation import shard_of

    coin = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":export")))
    t = docs.select(
        "doc_id",
        F.col("text"),
        coin.alias("_coin"),
        _n_tokens(F.col("text")).alias("n_tokens"),
    ).withColumn("shard", shard_of(F.col("_coin"), n_shards))
    w = Window.partitionBy("shard").orderBy("_coin", "doc_id")
    cum_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = t.withColumn("pos", F.row_number().over(w)).withColumn(
        "cum", F.sum("n_tokens").over(cum_w)
    )
    first_seq = F.expr(f"div(cum - n_tokens, {seq_len})")
    last_seq = F.expr(f"div(greatest(cum - 1, 0), {seq_len})")
    return c.select(
        "doc_id",
        "shard",
        F.col("pos").cast("long").alias("pos"),
        "n_tokens",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
        "text",
    )


def shard_manifest(packed: DataFrame) -> list[dict]:
    """Per-shard verification rows from the packed frame: doc/token/seq
    totals plus the order-sensitive xor fingerprint. O(n_shards) rows."""
    rows = (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("last_seq") + 1).alias("n_seqs"),
            F.bit_xor(
                F.xxhash64(F.col("doc_id"), F.col("pos"), F.col("n_tokens"))
            ).alias("fingerprint"),
        )
        .orderBy("shard")
        .collect()
    )
    return [
        {
            "shard": r["shard"],
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_seqs": r["n_seqs"],
            "fingerprint": r["fingerprint"],
        }
        for r in rows
    ]


def export(
    spark,
    input_dir: str,
    output: str,
    n_shards: int = 64,
    seq_len: int = 512,
    token_budget: int | None = None,
) -> dict:
    """Run the export; returns the manifest dict (also written to
    ``<output>/manifest.json``)."""
    docs = spark.read.parquet(f"{input_dir}/documents.parquet")
    n_in = docs.count()
    if token_budget is not None:
        docs = budget_filter(docs, token_budget)
    packed = plan_export(docs, n_shards=n_shards, seq_len=seq_len)
    packed.write.mode("error").partitionBy("shard").parquet(
        os.path.join(output, "shards")
    )
    # manifest from the WRITTEN files — verifying the artifact, not the plan
    written = spark.read.parquet(os.path.join(output, "shards"))
    shards = shard_manifest(written)
    manifest = {
        "n_docs_in": n_in,
        "n_docs_out": int(sum(s["n_docs"] for s in shards)),
        "n_tokens": int(sum(s["n_tokens"] for s in shards)),
        "n_shards": n_shards,
        "seq_len": seq_len,
        "token_budget": token_budget,
        "shards": shards,
    }
    with open(os.path.join(output, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def main() -> None:
    from ocr_application_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--token-budget", type=int, default=None)
    args = ap.parse_args()

    spark = get_spark("export-job")
    m = export(
        spark,
        args.input,
        args.output,
        n_shards=args.shards,
        seq_len=args.seq_len,
        token_budget=args.token_budget,
    )
    print(json.dumps({k: v for k, v in m.items() if k != "shards"}))
    spark.stop()


if __name__ == "__main__":
    main()
