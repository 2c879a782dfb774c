"""The driver's CORRECTNESS gate runs at sf0.01 but samples only
queries()[:50]; the post-freeze ops listed here sit OUTSIDE that window
(`_ROTATED_BACK`, rationale per name in `__spark_entry__.py`), so this
module is their sf0.01 gate: the IDENTICAL comparison the driver runs,
at the driver's scale factor — backing the "bit-for-bit at both SFs"
claims in the rotation rationale (sf0.001 runs in test_oracle_parity).
"""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.01"

# every never-driver-sampled op added after the r03 window freeze
POST_FREEZE = [
    "link_host_hits",
    "sketch_bloom_seen",
    "sketch_cms_counts",
    "dedup_bloom_antijoin",
    "sketch_kmv_overlap",
    "dedup_winnow",
    "overlap_incremental_ingest",
    "snapshot_delete_rows",
    "crawl_politeness_schedule",
    "crawl_robots_filter",
    "sample_dsir_topk",
    "snapshot_zorder_scan",
    "snapshot_wap_publish",
    "snapshot_drift_report",
    "url_surt_index",
    "url_sitemap_extract",
    "crawl_recrawl_candidates",
    "crawl_acquisition_pipeline",
    "warc_response_roundtrip",
    "text_nfc_normalize",
    "sketch_hdr_quantiles",
    "extract_yield_report",
    "extract_charset_sniff",
]

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_post_freeze_list_is_current():
    # every listed op must exist, be oracle-paired, and sit outside the
    # driver's 50-slot window (else it has a driver row and this module
    # is redundant for it)
    names = list(_QUERIES)
    window = set(names[:50])
    for n in POST_FREEZE:
        assert n in _QUERIES and n in _ORACLES, n
        assert n not in window, f"{n} is driver-sampled now; drop it here"


@pytest.mark.parametrize("name", POST_FREEZE)
def test_oracle_parity_sf01(name, spark, con):
    errs, max_delta = compare(
        _QUERIES[name](spark, SF_DIR), con, _ORACLES[name], name
    )
    assert not errs, f"{name}: {errs} (max float rel delta {max_delta:.2e})"
