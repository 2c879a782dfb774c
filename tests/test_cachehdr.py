"""Unit tests for cachehdr: RFC 9111 freshness over a fetch log.

Oracle parity value-checks the fixture grid at both SFs; these pin the
library-surface semantics on handwritten headers: directive precedence,
token boundaries, the past-Expires clamp, the 10% heuristic, and the
validator-choice ladder.
"""

import pandas as pd

from ocr_application_spark.operators.cachehdr import cache_freshness

_US = 1_000_000
_FETCH = 1_709_251_200_000_000  # 2024-03-01T00:00:00Z


def _one(spark, cc="", expires=None, lm=None, etag="", fetched=_FETCH):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "fetched_epoch_us": pd.array([fetched], dtype="Int64"),
                "cache_control": [cc],
                "expires_epoch_us": pd.array([expires], dtype="Int64"),
                "last_modified_epoch_us": pd.array([lm], dtype="Int64"),
                "etag": [etag],
            }
        )
    )
    return cache_freshness(df).first()


def test_no_store_beats_max_age(spark):
    r = _one(spark, cc="no-store, max-age=3600")
    assert r.no_store and r.lifetime_us == 0
    assert r.next_fetch_epoch_us == _FETCH


def test_max_age_beats_expires(spark):
    r = _one(spark, cc="max-age=60", expires=_FETCH + 7200 * _US)
    assert r.lifetime_us == 60 * _US


def test_token_boundary_no_storefront_is_not_no_store(spark):
    r = _one(spark, cc="no-storefront, max-age=5")
    assert not r.no_store and r.lifetime_us == 5 * _US


def test_past_expires_clamps_to_zero(spark):
    r = _one(spark, expires=_FETCH - 1)
    assert r.lifetime_us == 0 and r.next_fetch_epoch_us == _FETCH


def test_last_modified_heuristic_is_ten_percent_of_age(spark):
    r = _one(spark, lm=_FETCH - 100 * _US)
    assert r.lifetime_us == 10 * _US


def test_future_last_modified_clamps_to_zero(spark):
    r = _one(spark, lm=_FETCH + 50 * _US)
    assert r.lifetime_us == 0


def test_no_headers_means_refetch_now_unconditional(spark):
    r = _one(spark)
    assert r.lifetime_us == 0
    assert r.next_fetch_epoch_us == _FETCH
    assert r.revalidate_mode == "unconditional"


def test_no_cache_flag_does_not_zero_lifetime(spark):
    # RFC 9111: no-cache = revalidate before reuse, not uncacheable
    r = _one(spark, cc="no-cache, max-age=300")
    assert r.no_cache and r.lifetime_us == 300 * _US


def test_etag_beats_last_modified_as_validator(spark):
    r = _one(spark, lm=_FETCH - _US, etag='"abc"')
    assert r.revalidate_mode == "etag"
    r = _one(spark, lm=_FETCH - _US)
    assert r.revalidate_mode == "last-modified"


def test_case_insensitive_directives(spark):
    r = _one(spark, cc="Public, MAX-AGE=10")
    assert r.max_age_s == 10
    r = _one(spark, cc="NO-STORE")
    assert r.no_store
