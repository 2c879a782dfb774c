"""Edge semantics pinned for the curation operators.

seq_pack (VERDICT r03 #8): a zero-token doc at a shard head makes
``cum - 1`` negative. VERDICT predicted DuckDB ``//`` floors while
Spark ``div`` truncates; MEASURED on the shipped DuckDB (1.0.0) integer
``//`` also truncates toward zero, so the engines happen to agree on
negatives today — but an unguarded expression would still emit
``last_seq = -1`` (a nonsense sequence id), and DuckDB documents ``//``
loosely enough that relying on truncation is fragile. The
``greatest(cum - 1, 0)`` clamp both engines ship makes the question
moot; these tests pin (a) the measured division semantics so any future
DuckDB/Spark change that re-opens the floor/trunc gap fails loudly, and
(b) that the clamped expression agrees exactly on adversarial prefix
sums and lands a zero-token shard head in sequence 0.

Today's tokenization can never emit n_tokens == 0 (splitting even an
empty string yields one token), so the case is unreachable from data;
this is the contract test the op's comment points at.
"""

from __future__ import annotations

import duckdb

from ocr_application_spark.operators.curation import _SEQ_LEN


def test_integer_division_semantics_pinned_both_engines(spark):
    # MEASURED: DuckDB 1.0.0 integer '//' truncates toward zero, same
    # as Spark div. If either engine ever flips to floor division on
    # negatives, seq_pack's oracle mirror must be revisited — this
    # failing is the early alarm.
    duck = duckdb.sql(
        f"select (-1) // {_SEQ_LEN}, (-{_SEQ_LEN + 1}) // {_SEQ_LEN}"
    ).fetchone()
    assert duck == (0, -1)  # truncation
    srow = spark.sql(
        f"select div(-1, {_SEQ_LEN}), div(-{_SEQ_LEN + 1}, {_SEQ_LEN})"
    ).first()
    assert tuple(srow) == (0, -1)  # truncation


def test_seq_pack_clamped_expr_agrees_on_zero_token_shard_head(spark):
    # cum values as seen by a shard whose HEAD doc has n_tokens == 0
    # (cum stays 0 -> cum - 1 == -1), plus boundary-straddling values
    cums = [0, 1, _SEQ_LEN - 1, _SEQ_LEN, _SEQ_LEN + 1, 5 * _SEQ_LEN]
    expr = f"cast(greatest(cum - 1, 0) // {_SEQ_LEN} as bigint)"
    duck = duckdb.sql(
        "select "
        + expr
        + " from (values "
        + ", ".join(f"({c})" for c in cums)
        + ") t(cum) order by cum"
    ).fetchall()
    sdf = spark.createDataFrame([(c,) for c in cums], ["cum"])
    got = [
        r["last_seq"]
        for r in sdf.selectExpr(
            "cum", f"div(greatest(cum - 1, 0), {_SEQ_LEN}) as last_seq"
        )
        .orderBy("cum")
        .collect()
    ]
    assert got == [d[0] for d in duck]
    # and the shard-head zero-token doc lands in sequence 0, not -1
    assert got[0] == 0


# --- word-blocklist gate ---------------------------------------------------------
def test_word_blocklist_token_exact_never_substring(spark):
    import pandas as pd

    from ocr_application_spark.operators.curation import word_blocklist_gate

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "a slow query"),               # exact hit
                (1, "slowly sorted slowdown"),     # substring only: clean
                (2, "SLOW, crash! slow."),         # case-fold + punct split
                (3, "totally clean text"),
                (4, None),                          # null text: no row
                (5, ""),                            # empty: clean
            ],
            columns=["doc_id", "text"],
        )
    )
    out = {r["doc_id"]: r for r in word_blocklist_gate(docs).collect()}
    assert out[0]["n_flagged"] == 1 and not out[0]["keep"]
    assert out[1]["n_flagged"] == 0 and out[1]["keep"]
    assert out[2]["n_flagged"] == 3
    assert out[2]["flagged_terms"] == "crash,slow"
    assert out[3]["keep"] and out[3]["flagged_terms"] == ""
    assert 4 not in out
    assert out[5]["keep"]


# --- split_leakage_report ----------------------------------------------------


def test_split_leakage_detects_cross_split_mirror(spark, tmp_path):
    """An identical text in train and valid must score leak_bp 10000 on
    the valid side; a unique text scores 0; train docs emit no row."""
    import pyspark.sql.functions as F

    from ocr_application_spark.operators.curation import split_leakage_report

    # phase 1: learn which doc_ids the url coin sends to which split
    probe_rows = [(i, " ".join(f"w{i}t{j}" for j in range(20))) for i in range(120)]
    p = str(tmp_path / "leak")
    spark.createDataFrame(probe_rows, "doc_id long, text string").write.parquet(
        p + "/documents.parquet"
    )
    out1 = split_leakage_report(spark, p)
    splits = {r["doc_id"]: r["split"] for r in out1.collect()}
    evals = [d for d, s in splits.items() if s in ("valid", "test")]
    trains = [d for d in range(120) if d not in splits]  # train docs emit no row
    assert evals and trains
    mirror_eval, clean_eval = evals[0], evals[1]
    mirror_train = trains[0]

    # phase 2: craft texts — the mirror pair shares every 13-gram
    shared = " ".join(f"common{j}" for j in range(25))
    rows = []
    for i in range(120):
        if i == mirror_train or i == mirror_eval:
            rows.append((i, shared))
        else:
            rows.append((i, " ".join(f"u{i}x{j}" for j in range(20))))
    import shutil

    shutil.rmtree(p)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        p + "/documents.parquet"
    )
    out2 = {r["doc_id"]: r for r in split_leakage_report(spark, p).collect()}
    assert out2[mirror_eval]["leak_bp"] == 10000
    assert out2[mirror_eval]["n_leaked"] == out2[mirror_eval]["n_grams"]
    assert out2[clean_eval]["leak_bp"] == 0
    assert mirror_train not in out2  # train side is audited against, not reported


# --- text_window_chunks ------------------------------------------------------


def test_window_chunks_cover_every_token_with_stride_overlap(spark):
    import pyspark.sql.functions as F

    from ocr_application_spark.operators.curation import _WIN_S, _WIN_W, window_chunks

    rows = [
        (1, " ".join(f"t{j}" for j in range(200))),  # multi-window
        (2, " ".join(f"s{j}" for j in range(64))),  # exactly W -> one window
        (3, "one two"),  # short -> one window
        (4, ""),  # empty -> absent
        (5, " ".join(f"u{j}" for j in range(65))),  # W+1 -> two windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in window_chunks(df).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert 4 not in out
    assert len(out[2]) == 1 and out[2][0]["n_win_tokens"] == 64
    assert len(out[3]) == 1 and out[3][0]["n_win_tokens"] == 2
    assert len(out[5]) == 2  # tail window catches token 65
    w1 = sorted(out[1], key=lambda r: r["win_no"])
    # starts advance by the stride; coverage reaches the last token
    assert [r["start_tok"] for r in w1] == [i * _WIN_S for i in range(len(w1))]
    last = w1[-1]
    assert last["start_tok"] + last["n_win_tokens"] == 200
    # consecutive windows overlap by W - S tokens
    for a, b in zip(w1, w1[1:]):
        assert b["start_tok"] == a["start_tok"] + _WIN_S
        assert a["start_tok"] + _WIN_W > b["start_tok"]


def test_window_digest_pins_content_not_position(spark):
    from ocr_application_spark.operators.curation import window_chunks

    text = " ".join(f"w{j}" for j in range(64))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = window_chunks(df).collect()
    digs = {r["doc_id"]: r["win_digest"] for r in got}
    assert digs[1] == digs[2]  # identical content -> identical digest
