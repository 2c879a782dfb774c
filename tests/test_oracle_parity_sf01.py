"""The driver's CORRECTNESS gate runs at sf0.01 but samples only
queries()[:50]; any op that sits OUTSIDE that window while its
implementation or oracle changed after its last driver-green row gets
its sf0.01 gate here — the IDENTICAL comparison the driver runs, at the
driver's scale factor (sf0.001 runs for every oracle in
test_oracle_parity). In r04 all 28 previously-never-driver-checked ops
rotated INTO the window (VERDICT r03 #4), so this list holds only
out-of-window ops touched since their last driver row. Keep it current:
touch an out-of-window op -> add its name; it earns a driver row -> drop
it.
"""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.01"

# out-of-window ops whose implementation/oracle changed after their last
# driver-green row, plus ops NEW this round that landed after the window
# froze (entrymod._NEW_R04_OUTSIDE — they get here what a slot would
# have given them: the driver-identical compare at the driver's SF)
STALE_OUTSIDE = [
    "cdc_incremental_ingest",
    "classify_calibration_report",
    "corpus_zipf_report",
    "crawl_frontier_priority",
    "crawl_sitemap_discovery",
    "dedup_cdc_chunks",
    "link_host_components",
    "page_markdown",
    "split_leakage_report",
    "text_confusable_fold",
    "text_window_chunks",
    "multimodal_phash",
    "multimodal_phash_pairs",
    "text_script_mix",
    "emb_kmeans_assign",
    "emb_semdedup",
    "url_sitemap_index",
    "page_hreflang_clusters",
    "page_pagination_series",
    "text_word_blocklist",
    "text_sentence_split",
    "text_fk_readability",
    "crawl_delay_directives",
    "host_quality_report",
    "page_heading_outline",
    "page_section_chunks",
]

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_stale_outside_list_is_current():
    names = list(_QUERIES)
    window = set(names[:50])
    for n in STALE_OUTSIDE:
        assert n in _QUERIES and n in _ORACLES, n
        assert n not in window, f"{n} is driver-sampled now; drop it here"


@pytest.mark.parametrize("name", STALE_OUTSIDE or ["__none__"])
def test_oracle_parity_sf01(name, spark, con):
    if name == "__none__":
        pytest.skip("no out-of-window op touched since its last driver row")
    errs, max_delta = compare(
        _QUERIES[name](spark, SF_DIR), con, _ORACLES[name], name
    )
    assert not errs, f"{name}: {errs} (max float rel delta {max_delta:.2e})"
