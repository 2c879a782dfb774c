"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline, as an iterative Spark
algorithm over the corpus word histogram.

Shape per merge round (the classic algorithm, distributed):

1. pair counts: explode each word's adjacent symbol pairs, weighted by
   the word's corpus count — one map-side-combined aggregation whose
   shuffle is O(distinct pairs), never O(corpus);
2. best pair: TakeOrdered(1) by (count desc, left asc, right asc) — a
   deterministic tie-break so any engine / partitioning / re-run picks
   the same merge sequence; ONE row is collected per round (bounded
   driver data, same discipline as the IVF training cap);
3. apply: a greedy left-to-right fold over each word's symbol array
   (``F.aggregate`` — the exact merge order ``re``-based reference BPE
   uses), then ``localCheckpoint`` to truncate the iterative lineage
   (PERF.md §4d: persist alone leaves an exponentially growing plan).

Scale notes: the state that iterates is the WORD HISTOGRAM (distinct
words × symbol arrays), not the corpus — 100 TB of text folds to a
vocabulary-sized frame in step 0's single aggregation, which is why
corpus-scale BPE is feasible at all. Words are short, so the per-word
fold is bounded; rounds are driver-sequenced like connected components.

Verification: no SQL oracle (iterative argmax is genuinely non-SQL,
per the repo contract) — pinned instead by a differential test against
a pure-Python reference BPE on the same corpus
(tests/test_properties.py::test_bpe_train_matches_python_reference).

Reference parity note: the reference app has no tokenizer trainer; this
op belongs to the training-data-pipeline suite (like dedup/ANN), where
vocabulary building (textfns.text_vocabulary) already lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_application_spark.session import release_local_checkpoint

_END = "</w>"  # end-of-word marker (Sennrich's convention)


def word_histogram(docs: DataFrame) -> DataFrame:
    """(word, count, syms) over the corpus — the only corpus-sized
    aggregation; everything iterative runs on its output."""
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""),  # single characters, in order
        F.array(F.lit(_END)),
    )
    return words.select("word", "count", syms.alias("syms"))


def _merge_fold(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) inside a symbol
    array — the same order a regex-replace reference implementation
    applies. The accumulator is the output array; pairs consumed by a
    merge cannot overlap the next one (matching re.sub semantics)."""
    merged = a + b

    def step(out, s):
        prev = F.element_at(out, -1)
        can = (F.size(out) > 0) & (prev == a) & (s == b)
        # guard: prev must not itself be the result of a merge at this
        # position... not needed: once (a,b) merges into `merged`,
        # prev == merged != a (a+b != a because b is nonempty), so the
        # fold cannot re-consume it — re.sub parity holds.
        return F.when(
            can,
            F.concat(
                F.slice(out, 1, F.size(out) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(out, F.array(s)))

    return step


def bpe_train(
    docs: DataFrame, n_merges: int = 10
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    table (rank, left, right, merged, pair_count — the artifact a
    tokenizer ships) and the final (word, count, syms) histogram."""
    hist = word_histogram(docs).localCheckpoint(eager=True)
    merges: list[dict] = []
    for rank in range(n_merges):
        pairs = (
            hist.filter(F.size("syms") >= 2)
            .select(
                "count",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(
                            x.alias("left"), y.alias("right")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("count").alias("pair_count"))
        )
        best = pairs.orderBy(
            F.desc("pair_count"), F.asc("left"), F.asc("right")
        ).limit(1).collect()
        if not best:
            break
        a, b, c = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append(
            {
                "rank": rank,
                "left": a,
                "right": b,
                "merged": a + b,
                "pair_count": int(c),
            }
        )
        prev = hist
        hist = hist.select(
            "word",
            "count",
            F.aggregate(
                "syms",
                F.array().cast("array<string>"),
                _merge_fold(a, b),
            ).alias("syms"),
        ).localCheckpoint(eager=True)
        # release the superseded round's checkpointed blocks — a real
        # tokenizer learns 30k+ merges, and keeping every intermediate
        # histogram pinned would accumulate n_merges copies in executor
        # storage (the tarification/curate leak class; df.unpersist()
        # is a no-op for checkpoint storage, hence the helper)
        release_local_checkpoint(prev)
    return merges, hist


def bpe_demo(spark: SparkSession, sf_dir: str, n_merges: int = 10):
    """Convenience entry over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_train(docs, n_merges=n_merges)


def bpe_apply(docs: DataFrame, merges: list[dict]) -> DataFrame:
    """Tokenize the corpus with a learned merge table: (doc_id, tokens,
    n_tokens). The merge ranks BROADCAST (like the classifier's
    weights); application is Arrow-batched ``mapInPandas`` with a
    per-batch word cache — natural text repeats words heavily, so each
    distinct word is tokenized once per batch, not once per occurrence.
    This is the honest 100 TB shape for the apply side (training is
    relational because its state is the word histogram; applying is a
    per-word kernel, exactly where the repo's UDF policy allows Python,
    Arrow-batched and never per-row at the Spark level).

    Parity: the merge loop is the same greedy left-to-right fold
    ``bpe_train`` applies, so train-then-apply round-trips exactly
    (pinned by the differential pytest)."""
    ranks = {(m["left"], m["right"]): m["rank"] for m in merges}
    spark = docs.sparkSession
    b_ranks = spark.sparkContext.broadcast(ranks)

    def _apply_batches(batches):
        import pandas as pd

        rk = b_ranks.value

        def tok_word(w: str) -> list[str]:
            syms = list(w) + [_END]
            # lowest-rank merge first (the order training learned them)
            while len(syms) >= 2:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, bi = r, i
                if best is None:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            return syms

        for pdf in batches:
            cache: dict[str, list[str]] = {}
            toks_col = []
            for text in pdf["text"].to_numpy():
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = tok_word(w)
                    toks.extend(got)
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _apply_batches, schema="doc_id bigint, tokens array<string>, n_tokens int"
    )
