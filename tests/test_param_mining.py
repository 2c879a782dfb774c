"""param_mining: evidence semantics the sf fixture doesn't isolate."""

from ocr_application_spark.operators.param_mining import mine_neutral_params


def _mine(spark, rows):
    df = spark.createDataFrame(rows, "url string, digest string")
    return {r.param_key: r for r in mine_neutral_params(df).collect()}


def test_conflict_free_merge_is_neutral_conflict_convicts(spark):
    out = _mine(
        spark,
        [
            # sess never changes content for /a
            ("https://e.com/a?sess=1&v=0", "d0"),
            ("https://e.com/a?sess=2&v=0", "d0"),
            # v flips content for /a at fixed sess... but sess differs;
            # conflict must come from a group differing ONLY in v:
            ("https://e.com/a?sess=1&v=1", "d1"),
        ],
    )
    assert out["sess"].neutral  # merged {sess=1,sess=2} at v=0, same digest
    assert not out["v"].neutral  # {v=0,v=1} at sess=1 -> d0 vs d1 conflict
    assert out["v"].n_conflict_groups == 1


def test_no_merge_evidence_is_not_neutral(spark):
    # 'id' appears once per residual: removing it never merges anything,
    # so there is no evidence either way -> NOT neutral (absence of
    # evidence is not a license to strip)
    out = _mine(
        spark,
        [
            ("https://e.com/a?id=1", "d0"),
            ("https://e.com/b?id=2", "d1"),
        ],
    )
    assert not out["id"].neutral
    assert out["id"].n_merged_groups == 0
    assert out["id"].n_conflict_groups == 0


def test_queryless_urls_and_fragments_contribute_nothing(spark):
    out = _mine(
        spark,
        [
            ("https://e.com/plain", "d0"),
            ("https://e.com/frag#sec=1", "d1"),  # '#...' is not a query
            ("https://e.com/q?k=1&k2=2", "d2"),
        ],
    )
    assert set(out) == {"k", "k2"}


def test_param_order_insensitive_residual(spark):
    # ?a=1&b=2 and ?b=2&a=1 must land in ONE residual group when
    # judging a third key c
    out = _mine(
        spark,
        [
            ("https://e.com/x?a=1&b=2&c=9", "d0"),
            ("https://e.com/x?b=2&a=1&c=8", "d0"),
        ],
    )
    assert out["c"].n_groups == 1
    assert out["c"].n_merged_groups == 1
    assert out["c"].neutral


def test_duplicate_fetches_do_not_inflate_evidence(spark):
    # the same url fetched twice is one URL, not merge evidence
    out = _mine(
        spark,
        [
            ("https://e.com/x?s=1", "d0"),
            ("https://e.com/x?s=1", "d0"),
        ],
    )
    assert out["s"].n_urls == 1
    assert out["s"].n_merged_groups == 0
    assert not out["s"].neutral
