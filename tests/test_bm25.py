"""Integer BM25 retrieval (textfns.bm25_topk): randomized differential
vs a dict-model twin of the fixed-point spec, ranking sanity, tiebreak
determinism, k clamp, empty corpus."""

import random

import pytest

from ocr_application_spark.operators.textfns import _BM25_IDF_CAP, bm25_topk


def _reference_bm25(docs, queries, k=5):
    """Dict-model twin of the integer spec (same op sequence: un-logged
    capped micro idf, integer avgdl, k1=12/10 and b=3/4 as the exact
    div chains in bm25_topk)."""
    toks = {
        d: [t for t in text.lower().split(" ") if t] for d, text in docs
    }
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    if not dl:
        return []
    n = len(dl)
    avgdl = max(1, sum(dl.values()) // n)
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfreq = {}
    for _, t in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    out = []
    for qid, qtext in queries:
        qterms = {t for t in qtext.lower().split(" ") if t}
        scores = {}
        for (d, t), f in tf.items():
            if t not in qterms:
                continue
            df = dfreq[t]
            idf = min((1000000 * (2 * (n - df) + 1)) // (2 * df + 1), _BM25_IDF_CAP)
            denom = f * 1000000 + (12 * (250000 + (750000 * dl[d]) // avgdl)) // 10
            scores[d] = scores.get(d, 0) + (idf * ((f * 2200000 * 1000000) // denom)) // 1000000
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, d, s, i + 1) for i, (d, s) in enumerate(ranked)
        )
    return sorted(out)


def _run(spark, docs, queries, k=5):
    ddf = spark.createDataFrame(list(docs) or [], "doc_id long, text string")
    qdf = spark.createDataFrame(list(queries) or [], "query_id string, qtext string")
    return sorted(
        (r["query_id"], r["doc_id"], r["score_micro"], r["rank"])
        for r in bm25_topk(ddf, qdf, k=k).collect()
    )


VOCAB = "join hash scan filter merge batch row column the a of data".split()


def test_bm25_matches_dict_model_on_random_corpora(spark):
    rng = random.Random(20260818)
    for trial in range(4):
        docs = [
            (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 30))))
            for i in range(rng.randint(3, 25))
        ]
        queries = [
            (f"q{j}", " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 4))))
            for j in range(3)
        ]
        k = rng.randint(1, 6)
        got, want = _run(spark, docs, queries, k), _reference_bm25(docs, queries, k)
        assert got == want, f"trial {trial}"


def test_bm25_ranks_matching_doc_first(spark):
    docs = [
        (1, "hash join over the wire"),
        (2, "nothing relevant here at all"),
        (3, "join the queue"),
    ]
    rows = _run(spark, docs, [("q", "hash join")], k=3)
    assert [r[1] for r in sorted(rows, key=lambda r: r[3])] == [1, 3]  # doc 2 absent


def test_bm25_score_tie_breaks_by_doc_id(spark):
    docs = [(7, "alpha beta"), (3, "alpha beta"), (9, "alpha beta")]
    rows = sorted(_run(spark, docs, [("q", "alpha")], k=3), key=lambda r: r[3])
    assert [r[1] for r in rows] == [3, 7, 9]
    assert len({r[2] for r in rows}) == 1  # identical scores, rank by id


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = [(1, "alpha beta"), (2, "alpha alpha beta")]
    once = _run(spark, docs, [("q", "alpha")], k=2)
    twice = _run(spark, docs, [("q", "alpha alpha")], k=2)
    assert [r[1:] for r in once] == [r[1:] for r in twice]


def test_bm25_validation_and_empty(spark):
    with pytest.raises(ValueError, match="k must be"):
        _run(spark, [(1, "x")], [("q", "x")], k=0)
    assert _run(spark, [(1, ""), (2, "  ")], [("q", "x")]) == []


def test_checkpoint_tokens_dial_is_value_neutral(spark):
    # the materialize-vs-rescan dial must not change a single value
    docs = [(i, f"term{i % 7} shared word{i % 3}") for i in range(40)]
    queries = [("q", "term1 shared")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id string, qtext string")
    lazy = sorted(map(tuple, bm25_topk(ddf, qdf, k=10).collect()))
    ckpt = sorted(
        map(tuple, bm25_topk(ddf, qdf, k=10, checkpoint_tokens=True).collect())
    )
    assert lazy == ckpt


# --- corpus_zipf_report ------------------------------------------------------


def test_zipf_slope_discriminates_zipfian_from_uniform(spark, tmp_path):
    """A crafted corpus with tf ~ 1/rank must fit slope ~ -1000 milli;
    a uniform-frequency corpus fits ~ 0. The report is what flags
    machine-generated (flat) token distributions."""
    from ocr_application_spark.operators.textfns import corpus_zipf_report

    # zipfian: token w{r} appears ceil(600/r) times
    words = []
    for r in range(1, 41):
        words += [f"w{r}"] * (600 // r)
    zipf_doc = " ".join(words)
    p1 = str(tmp_path / "zipf")
    spark.createDataFrame([(1, zipf_doc)], "doc_id long, text string").write.parquet(
        p1 + "/documents.parquet"
    )
    z = corpus_zipf_report(spark, p1).collect()[0]
    assert -1100 <= z["slope_milli"] <= -900, z

    uni_doc = " ".join([f"u{r}" for r in range(1, 41)] * 15)
    p2 = str(tmp_path / "uni")
    spark.createDataFrame([(1, uni_doc)], "doc_id long, text string").write.parquet(
        p2 + "/documents.parquet"
    )
    u = corpus_zipf_report(spark, p2).collect()[0]
    assert u["slope_milli"] == 0, u
    assert u["vocab_size"] == 40 and u["total_tokens"] == 600
