"""DSIR importance resampling: spec differential + selection laws
beyond oracle parity (tests/test_oracle_parity.py pins the SQL twin)."""

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from ocr_application_spark.operators.curation import _DSIR_DIMS, dsir_weights

DOCS = [
    # (doc_id, text, lang) — 'en' is the target slice
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the lazy dog sleeps while the quick fox runs", "en"),
    (3, "le renard brun rapide saute par dessus le chien", "fr"),
    (4, "der schnelle braune fuchs springt ueber den hund", "de"),
    (5, "the quick dog and the lazy fox", "fr"),  # en-like text, raw-only lang
    (6, "renard chien le le le", "fr"),
    (7, "", "en"),  # token-less: must be absent from the output
]


def _py_twin(docs, n_dims):
    """Pure-Python DSIR spec: hashed dims, add-one unigram log-ratio
    quantized to micro-nats per dim, integer per-doc sums."""

    def dim(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_dims

    toks = [
        (i, lang == "en", dim(t))
        for i, text, lang in docs
        for t in text.split(" ")
        if t != ""
    ]
    c_r = Counter(d for _, _, d in toks)
    c_t = Counter(d for _, is_t, d in toks if is_t)
    n_r, n_t = len(toks), sum(1 for _, is_t, _ in toks if is_t)
    l_micro = {
        d: int(
            round(
                1e6
                * math.log(
                    float((c_t.get(d, 0) + 1) * (n_r + n_dims))
                    / float((c_r[d] + 1) * (n_t + n_dims))
                )
            )
        )
        for d in c_r
    }
    out = {}
    for i, _, d in toks:
        n, w = out.get(i, (0, 0))
        out[i] = (n + 1, w + l_micro[d])
    return out


def test_dsir_weights_match_python_twin(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    got = {
        r.doc_id: (r.n_toks, r.dsir_weight_micro)
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert got == _py_twin(DOCS, _DSIR_DIMS)


def test_dsir_ranks_target_like_text_above_disjoint_text(spark):
    """Selection law: documents sharing the target slice's vocabulary
    outscore documents with disjoint vocabulary — including doc 5,
    whose LANG is raw-only but whose TEXT is English (DSIR scores the
    bag of words, not the label)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])
    w = {
        r.doc_id: r.dsir_weight_micro / r.n_toks
        for r in dsir_weights(docs, F.col("lang") == "en").collect()
    }
    assert 7 not in w  # token-less doc drops out
    en_like, disjoint = {1, 2, 5}, {3, 4, 6}
    assert min(w[i] for i in en_like) > max(w[i] for i in disjoint), w
