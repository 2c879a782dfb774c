"""Bigram-LM scoring (operators/lm.py): edge cases the driver fixtures
never exercise, the min_count pruning dial, and the plan contract.

Oracle parity for the gate query runs in test_oracle_parity.py like
every other queries() entry; these tests pin the semantics.
"""

import math

import pandas as pd
import pytest

from ocr_application_spark.operators.lm import (
    bigram_lm_tables,
    score_documents,
    text_lm_score,
)

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def test_short_docs_excluded_and_oov_counted(spark):
    docs = _docs(
        spark,
        [
            (1, "the cat sat", "en", "s", 11),
            (2, "single", "en", "s", 6),  # 1 token: no bigrams, no row
            (3, "völlig unbekannte wörter", "de", "s", 24),  # all OOV
        ],
    )
    big, ctx, vocab = bigram_lm_tables(docs)
    out = {r["doc_id"]: r for r in score_documents(docs, big, ctx, vocab).collect()}
    assert set(out) == {1, 3}
    # training slice = docs 1 and 2 (both en); doc 2 has no bigrams but
    # its token still enters the vocabulary: V = {the,cat,sat,single} = 4
    assert out[1]["n_bigrams"] == 2 and out[1]["oov_bigrams"] == 0
    # seen bigrams: c12 = 1, c1 = 1, V = 4 -> ln(2/5) per pair
    expected = 2 * round(1e6 * math.log(2.0 / 5.0))
    assert out[1]["lm_logprob_micro"] == expected
    # doc 3 is not training (lang=de) but is scored; every pair unseen
    assert out[3]["n_bigrams"] == 2 and out[3]["oov_bigrams"] == 2
    assert out[3]["lm_logprob_micro"] == 2 * round(1e6 * math.log(1.0 / 4.0))


def test_min_count_prunes_model_to_oov(spark):
    # "a b" appears twice, "b c" once; min_count=2 drops "b c"
    docs = _docs(
        spark,
        [
            (1, "a b c", "en", "s", 5),
            (2, "a b", "en", "s", 3),
        ],
    )
    big1, ctx1, vocab = bigram_lm_tables(docs, min_count=1)
    big2, ctx2, _ = bigram_lm_tables(docs, min_count=2)
    assert big1.count() == 2 and big2.count() == 1
    s1 = {r["doc_id"]: r for r in score_documents(docs, big1, ctx1, vocab).collect()}
    s2 = {r["doc_id"]: r for r in score_documents(docs, big2, ctx2, vocab).collect()}
    assert s1[1]["oov_bigrams"] == 0 and s2[1]["oov_bigrams"] == 1
    # pruning can only lower (or keep) the smoothed log-prob
    for d in (1, 2):
        assert s2[d]["lm_logprob_micro"] <= s1[d]["lm_logprob_micro"]


def test_reference_like_docs_score_higher(spark):
    """The point of the CCNet filter: text made of training bigrams
    outscores (per-bigram) text the model never saw."""
    train = [(i, "the quick brown fox jumps", "en", "s", 25) for i in range(10)]
    docs = _docs(
        spark,
        train
        + [
            (100, "the quick brown fox", "en", "s", 19),
            (101, "zxq wvu tsr qpo nml", "en", "s", 19),
        ],
    )
    big, ctx, vocab = bigram_lm_tables(docs)
    out = {r["doc_id"]: r for r in score_documents(docs, big, ctx, vocab).collect()}
    rate = lambda r: r["lm_logprob_micro"] / r["n_bigrams"]  # noqa: E731
    assert rate(out[100]) > rate(out[101])


def test_empty_training_slice_yields_null_scores_not_garbage(spark):
    """V = 0 makes the smoothed ratio 1/0 = inf, whose ANSI bigint cast
    would throw mid-job; the operator guards it to NULL scores (loud
    downstream) while the structural counts stay correct."""
    docs = _docs(spark, [(1, "sin datos de entrenamiento", "es", "s", 26)])
    big, ctx, vocab = bigram_lm_tables(docs)
    out = score_documents(docs, big, ctx, vocab).collect()
    assert out[0]["oov_bigrams"] == out[0]["n_bigrams"] == 3
    assert out[0]["lm_logprob_micro"] is None


def test_gate_query_runs_at_sf0001(spark):
    out = text_lm_score(spark, "/root/testdata/sf0.001")
    assert out.count() == 500
    assert out.where("lm_logprob_micro >= 0").count() == 0  # log-probs are negative


def test_lm_gate_in_curation_funnel(spark, tmpdir_scratch):
    """Opt-in lm gate: gibberish falls below the keep-quantile of the
    per-bigram log-prob rate, reference-like prose survives; an input
    with no trainable slice fails loud instead of zeroing the corpus."""
    from jobs.curate_job import curate

    prose = [
        (i, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 60)
        for i in range(20)
    ]
    junk = [
        (100 + i, f"zq{i}w vx{i}u tr{i}s qo{i}p nl{i}m kj{i}h", "en", "s", 30)
        for i in range(4)
    ]
    _docs(spark, prose + junk).write.mode("overwrite").parquet(
        tmpdir_scratch + "/documents.parquet"
    )
    curated, metrics = curate(
        spark, tmpdir_scratch, gates=("lm",), lm_keep_quantile=4 / 24
    )
    kept = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert all(i in kept for i in range(20))
    assert all(100 + i not in kept for i in range(4))
    assert metrics[0]["stage"] == "lm_perplexity" and metrics[0]["dropped"] == 4

    _docs(spark, [(1, "nur deutsch hier", "de", "s", 16)]).write.mode(
        "overwrite"
    ).parquet(tmpdir_scratch + "/documents.parquet")
    with pytest.raises(ValueError, match="empty training slice"):
        curate(spark, tmpdir_scratch, gates=("lm",))


# --- Naive-Bayes classifier -------------------------------------------------


def _nb_twin(rows):
    """Pure-Python replay of nb_langid: same coin, same add-one counts,
    same micro-nat quantization (HALF_UP, like Spark/DuckDB round),
    same (score desc, lang) argmax. Returns {doc_id: row-dict}."""
    import hashlib
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    q = lambda x: int(  # noqa: E731
        Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )
    toks = {d: [t for t in text.split(" ") if t] for d, _, text in rows}
    is_train = {
        d: hashlib.md5(f"{d}:nbtrain".encode()).hexdigest()[0] < "8"
        for d, _, _ in rows
    }
    c_lt, c_l, n_l, vocab, n_train = Counter(), Counter(), Counter(), set(), 0
    for d, lang, _ in rows:
        if not is_train[d]:
            continue
        n_train += 1
        n_l[lang] += 1
        for t in toks[d]:
            c_lt[lang, t] += 1
            c_l[lang] += 1
            vocab.add(t)
    out = {}
    for d, lang, _ in rows:
        if not toks[d]:
            continue
        scores = {}
        for lg in n_l:
            s = q(1e6 * math.log(n_l[lg] / n_train))
            for t, tf in Counter(toks[d]).items():
                s += tf * q(
                    1e6 * math.log((c_lt[lg, t] + 1) / (c_l[lg] + len(vocab)))
                )
            scores[lg] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[d] = {
            "lang": lang,
            "is_train": is_train[d],
            "pred_lang": ranked[0][0],
            "score_micro": ranked[0][1],
            "margin_micro": ranked[0][1] - ranked[1][1],
            "correct": ranked[0][0] == lang,
        }
    return out


def test_nb_langid_matches_python_twin_and_learns_separable_vocab(spark):
    """On a fixture where each lang owns a disjoint vocabulary (plus a
    shared filler), the trained model must classify every holdout doc
    correctly AND every output cell must equal the pure-Python twin —
    the same differential discipline as the extraction kernel."""
    from ocr_application_spark.operators.lm import nb_langid

    words = {"aa": "alpha beta gama", "bb": "delta eps zeta", "cc": "theta iota kapa"}
    rows = []
    for i in range(30):
        lang = ("aa", "bb", "cc")[i % 3]
        w = words[lang].split()
        rows.append((i, lang, f"{w[i % 3]} shared {w[(i + 1) % 3]} {w[0]}"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    )
    got = {r["doc_id"]: r.asDict() for r in nb_langid(docs).collect()}
    want = _nb_twin(rows)
    assert set(got) == set(want)
    for d, w in want.items():
        g = got[d]
        assert {k: g[k] for k in w} == w, f"doc {d}: {g} != {w}"
    # both splits are non-degenerate and every holdout doc classifies right
    holdout = [d for d, w in want.items() if not w["is_train"]]
    assert holdout and len(holdout) < len(rows)
    assert all(want[d]["correct"] for d in holdout)


def test_calibration_report_on_separable_fixture(spark, tmp_path):
    """On a separable-vocabulary corpus every eval doc classifies
    correctly, so EVERY populated margin bucket must report
    acc_bp == 10000 and the bucket counts must sum to the eval size."""
    from ocr_application_spark.operators.lm import (
        classify_calibration_report,
        nb_langid,
    )

    words = {"aa": "alpha beta gama", "bb": "delta eps zeta", "cc": "theta iota kapa"}
    rows = []
    for i in range(60):
        lang = ("aa", "bb", "cc")[i % 3]
        w = words[lang].split()
        rows.append((i, lang, f"{w[i % 3]} shared {w[(i + 1) % 3]} {w[0]}"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))
    p = str(tmp_path / "cal")
    df.write.parquet(p + "/documents.parquet")
    rep = classify_calibration_report(spark, p).collect()
    assert rep, "no buckets"
    assert all(r["acc_bp"] == 10000 for r in rep), rep
    n_eval = nb_langid(df).filter("not is_train").count()
    assert sum(r["n_docs"] for r in rep) == n_eval


def test_curate_funnel_new_gates_run_and_stay_monotone(spark):
    """blocklist / script / cdc slot into the funnel: stages appear in
    order, counts shrink monotonically, survivors carry curated
    columns."""
    from jobs.curate_job import curate

    curated, metrics = curate(
        spark,
        "/root/testdata/sf0.001",
        gates=("clean", "blocklist", "script", "rank", "cdc"),
    )
    names = [m["stage"] for m in metrics]
    assert names == [
        "clean_lang_quality_dedup", "word_blocklist", "script_mix",
        "rank_quality", "cdc_shared_chunks",
    ]
    outs = [m["rows_out"] for m in metrics]
    assert all(a >= b for a, b in zip(outs, outs[1:]))
    assert all(m["rows_in"] - m["rows_out"] == m["dropped"] for m in metrics)
    assert curated.count() == outs[-1]
    assert {"doc_id", "text", "split", "shard"} <= set(curated.columns)
