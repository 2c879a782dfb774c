"""Per-line language segmentation (textfns.lang_segments): islands
semantics on hand-built mixed pages; the gate query's oracle parity
runs in test_oracle_parity (both SFs at round close)."""

import pandas as pd

from ocr_application_spark.operators.textfns import lang_segments

EN = "the cat sat of the mat and went to a nap"      # stopword-dense
XX = "zzz qqq rrr sss ttt uuu vvv www"               # no stopwords


def _segs(spark, texts):
    docs = spark.createDataFrame(
        pd.DataFrame([(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"])
    )
    out = {}
    for r in lang_segments(docs).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["seg_idx"], r["lang"], r["start_line"], r["n_lines"], r["n_chars"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_islands_collapse_and_boundaries(spark):
    text = "\n".join([EN, EN, XX, XX, XX, EN])
    segs = _segs(spark, [text])[0]
    assert segs == [
        (0, "en-like", 0, 2, 2 * len(EN)),
        (1, "other", 2, 3, 3 * len(XX)),
        (2, "en-like", 5, 1, len(EN)),
    ]


def test_single_language_page_is_one_segment(spark):
    segs = _segs(spark, ["\n".join([EN] * 4)])[0]
    assert segs == [(0, "en-like", 0, 4, 4 * len(EN))]


def test_alternating_lines_one_segment_each(spark):
    segs = _segs(spark, ["\n".join([EN, XX, EN, XX])])[0]
    assert len(segs) == 4
    assert [s[1] for s in segs] == ["en-like", "other", "en-like", "other"]
    assert [s[3] for s in segs] == [1, 1, 1, 1]


def test_empty_text_and_null_text(spark):
    docs = spark.createDataFrame(
        pd.DataFrame([(0, ""), (1, None), (2, EN)], columns=["doc_id", "text"])
    )
    rows = lang_segments(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # empty text = one empty 'other' line; NULL text emits nothing
    assert len(by_doc[0]) == 1 and by_doc[0][0]["lang"] == "other"
    assert by_doc[0][0]["n_chars"] == 0
    assert 1 not in by_doc
    assert by_doc[2][0]["lang"] == "en-like"


def test_trailing_newline_yields_empty_tail_line(spark):
    segs = _segs(spark, [EN + "\n"])[0]
    # split keeps the empty tail: en-like line 0, other (empty) line 1
    assert segs == [(0, "en-like", 0, 1, len(EN)), (1, "other", 1, 1, 0)]


def test_line_threshold_is_eight_percent_exact(spark):
    # exactly 8%: 2 stopwords in 25 tokens -> en-like (>=, not >)
    at = " ".join(["the", "of"] + ["w"] * 23)
    below = " ".join(["the", "of"] + ["w"] * 24)  # 2/26 < 8%
    segs = _segs(spark, ["\n".join([at, below])])[0]
    assert [s[1] for s in segs] == ["en-like", "other"]


# --- sentence segmentation (textfns.split_sentences) -----------------------------
from ocr_application_spark.operators.textfns import split_sentences  # noqa: E402


def _sents(spark, text):
    docs = spark.createDataFrame(pd.DataFrame([(0, text)], columns=["doc_id", "text"]))
    rows = sorted(split_sentences(docs).collect(), key=lambda r: r["sent_idx"])
    return [r["sentence"] for r in rows]


def test_basic_boundaries_and_indexing(spark):
    assert _sents(spark, "One here. Two there! Three? Four") == [
        "One here.", "Two there!", "Three?", "Four",
    ]


def test_abbreviations_do_not_split(spark):
    assert _sents(spark, "Dr. Smith met Mr. Jones. They left.") == [
        "Dr. Smith met Mr. Jones.", "They left.",
    ]
    # the protected dot is RESTORED in the output byte-for-byte
    assert _sents(spark, "See No. 5 vs. No. 7.") == ["See No. 5 vs. No. 7."]


def test_closing_quote_and_decimal_numbers(spark):
    assert _sents(spark, 'He said "stop." Then left.') == [
        'He said "stop."', "Then left.",
    ]
    # a decimal point is never followed by space+capital: no split
    assert _sents(spark, "Pi is 3.14 about. Next one.") == [
        "Pi is 3.14 about.", "Next one.",
    ]


def test_lowercase_continuation_not_split(spark):
    assert _sents(spark, "e.g. this stays. and lowercase too") == [
        "e.g. this stays. and lowercase too",
    ]


def test_newlines_are_not_boundaries(spark):
    assert _sents(spark, "Line one.\nLine two.") == ["Line one.\nLine two."]


# --- FK readability (textfns.fk_readability) --------------------------------------
from ocr_application_spark.operators.textfns import fk_readability  # noqa: E402


def test_fk_counts_and_exact_integer_grade(spark):
    text = "The cat sat here. The dog ran away. A bird flew by."
    docs = spark.createDataFrame(pd.DataFrame([(0, text)], columns=["doc_id", "text"]))
    r = fk_readability(docs).collect()[0]
    assert r["n_sents"] == 3 and r["n_words"] == 12
    # vowel-group runs: the(1) cat(1) sat(1) here(2) the(1) dog(1)
    # ran(1) away(2: a|w|ay) a(1) bird(1) flew(1) by(1: y is a vowel)
    assert r["n_syll"] == 14
    assert r["fk_grade_micro"] == (
        390000 * 12 // 3 + 11800000 * 14 // 12 - 15590000
    )


def test_fk_single_word_no_terminal(spark):
    docs = spark.createDataFrame(pd.DataFrame([(0, "word")], columns=["doc_id", "text"]))
    r = fk_readability(docs).collect()[0]
    assert r["n_sents"] == 1 and r["n_words"] == 1 and r["n_syll"] == 1
