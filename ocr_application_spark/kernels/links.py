"""Outlink extraction — the crawl-graph feature stage.

A crawl pipeline needs the link graph for frontier prioritization and
host-level quality features (harvest ratio, intra/inter-host degree) —
the missing stage between ``operators/urlops.url_crawl_filter`` (which
decides WHAT to fetch) and the sampling operators (which decide what to
train on). The reference has no analog (it consumes documents one at a
time); this is one of the beyond-the-reference training-pipeline ops.

Extraction is regex-driven over the decoded page, NOT the main-content
parser: the hot extraction kernel deliberately skips attribute parsing
(PERF.md §4 — 80% of stdlib parser time was attribute bookkeeping the
scorer never reads), so links get their own narrow kernel instead of
slowing every extraction. The regexes follow the core tokenizer's
linear-time discipline (possessive quantifiers, no lazy backtracking;
pinned by ``test_links_linear_on_hostile_input``), and the semantics —
charset-sniffed decode, entity unescape, RFC-3986 resolution via
``urljoin``, fragment strip, scheme filtering — are pinned against a
stdlib ``html.parser`` + ``urljoin`` reference implementation by a
differential test (``test_outlinks_match_htmlparser_reference``).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator
from urllib.parse import urldefrag, urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_application_spark.core.extraction_core import decode_html

# tag head of an <a ...> element; [^>]*+ is possessive — hostile pages
# full of unclosed '<a ' openers scan in linear time
_A_TAG = re.compile(r"<[aA](?=[\s/>])([^>]*+)>?")
# href value: double-quoted, single-quoted, or bare token. The
# lookbehind (not \b) keeps 'data-href' from matching: '-' is a word
# BOUNDARY, so \bhref would fire inside it (caught by the differential)
_HREF = re.compile(
    r"""(?<![\w-])href\s*+=\s*+(?:"([^"]*+)"|'([^']*+)'|([^\s>"']++))""",
    re.IGNORECASE,
)

# schemes a crawl frontier never enqueues
_SKIP = ("javascript:", "mailto:", "data:", "tel:")


def resolve_outlink(page_url: str, raw: str) -> str | None:
    """One raw href -> absolute, fragment-free outlink (or None if it
    is empty, fragment-only, or a non-fetchable scheme). Entity
    unescape happens BEFORE resolution (an attribute value '&amp;' is a
    literal '&' — html.parser semantics, mirrored so the differential
    reference agrees byte-for-byte)."""
    raw = _html.unescape(raw).strip()
    if not raw or raw.startswith("#"):
        return None
    if raw.lower().startswith(_SKIP):
        return None
    out, _frag = urldefrag(urljoin(page_url, raw))
    return out or None


def outlinks_of(page_url: str, html_text: str) -> set[str]:
    """Distinct resolved outlinks of one decoded page."""
    return {link for _m, _h, _a, link in _iter_links(page_url, html_text)}


# anchor text: the close positions are precomputed once and looked up
# by bisect, so N unclosed opens before one close stay linear; the raw
# anchor window is bounded (hostile pages can't make one span O(page))
_A_CLOSE = re.compile(r"</[aA]\s*+>")
# markup INSIDE an anchor span, mirroring html.parser's tokenizer on
# real-web shapes (each branch possessive — linear on hostile input):
#   * comments end at '-->', not at the first '>' ('<!-- a>b -->' is
#     one comment);
#   * element tags respect quoted attribute values ('<img alt="a>b">'
#     ends after the quote, not inside it);
#   * '<!'/'<?' declarations/PIs end at the first '>';
#   * a '<' followed by anything else ('5 < 6', 'p <3 q') is TEXT,
#     exactly like html.parser.
_MARKUP = re.compile(
    r"<!--(?:[^-]++|-(?!->))*+-->"
    r"""|<[a-zA-Z/][^>"']*+(?:(?:"[^"]*+"|'[^']*+')[^>"']*+)*+>?"""
    r"|<[!?][^>]*+>?"
)
_ANCHOR_CAP = 500  # normalized chars kept
# raw chars read after each open tag: bounds per-link work, so a
# hostile page of N opens before one close costs O(N * window), linear
# in page size with this constant — not O(N^2)
_ANCHOR_RAW_WINDOW = 2048


def _normalize_anchor(raw_span: str) -> str:
    """Raw inter-tag span -> anchor text, html.parser data-event
    semantics: markup split out first, then each text piece entity-
    unescaped SEPARATELY (an entity broken across a tag — '&am<b>p;'
    — stays literal, exactly as the parser leaves it), pieces joined,
    whitespace collapsed, capped."""
    text = "".join(_html.unescape(p) for p in _MARKUP.split(raw_span))
    return " ".join(text.split())[:_ANCHOR_CAP]


def _iter_links(page_url: str, html_text: str):
    """Shared link discovery for outlinks_of / anchors_of — one loop so
    the two kernels' link sets cannot drift (their agreement is pinned
    by test): yields (open_match, href_match, attrs, resolved_link)."""
    for m in _A_TAG.finditer(html_text):
        attrs = m.group(1)
        h = _HREF.search(attrs)
        if h is None:
            continue
        raw = h.group(1) if h.group(1) is not None else (
            h.group(2) if h.group(2) is not None else h.group(3)
        )
        link = resolve_outlink(page_url, raw)
        if link is not None:
            yield m, h, attrs, link


def anchors_of(page_url: str, html_text: str) -> set[tuple[str, str]]:
    """Distinct (outlink, anchor) pairs of one decoded page. The anchor
    is the text between the open tag and the FIRST subsequent ``</a>``
    (html.parser event semantics, pinned by differentials in
    tests/test_links.py on curated edge shapes AND the synth corpus):
    inner markup dropped, entities unescaped per text piece, whitespace
    collapsed, at most ``_ANCHOR_CAP`` chars. A self-closed ``<a .../>``
    or an open with no later close has anchor ''. Hostile pages:
    anchors read at most ``_ANCHOR_RAW_WINDOW`` raw chars per link — a
    documented bound the differential corpus stays within."""
    import bisect

    closes = [m.start() for m in _A_CLOSE.finditer(html_text)]
    out: set[tuple[str, str]] = set()
    for m, h, attrs, link in _iter_links(page_url, html_text):
        # XHTML self-close: '/' IMMEDIATELY before '>' that is not part
        # of a bare href token. html.parser agrees on both edges:
        # '<a href=/x/>' is a normal start tag with href '/x/', and
        # '<a href="/x" / >' (whitespace after the slash) is a normal
        # start tag with junk — only '<a .../>'' fires startendtag.
        if attrs.endswith("/") and h.end() < len(attrs):
            out.add((link, ""))
            continue
        start = m.end()
        i = bisect.bisect_left(closes, start)
        if i < len(closes):
            span = html_text[start : min(closes[i], start + _ANCHOR_RAW_WINDOW)]
            out.add((link, _normalize_anchor(span)))
        else:
            out.add((link, ""))
    return out


def extract_anchors(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, outlink, anchor), one row per
    DISTINCT (outlink, anchor) pair per page — the anchor-text signal
    (what OTHER pages say a url is about) that retrieval and quality
    models train on. Same narrow Arrow-batched shape as
    extract_outlinks; per-dst anchor aggregation downstream shuffles on
    the destination key only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, links, anchors = [], [], []
            for page_url, raw in zip(pdf["url"], pdf["html"]):
                if raw is None:
                    continue
                for link, anchor in sorted(
                    anchors_of(page_url, decode_html(bytes(raw)))
                ):
                    urls.append(page_url)
                    links.append(link)
                    anchors.append(anchor)
            yield pd.DataFrame({"url": urls, "outlink": links, "anchor": anchors})

    return pages.select("url", "html").mapInPandas(
        run, schema="url string, outlink string, anchor string"
    )


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, outlink), one row per DISTINCT
    resolved outlink per page. Column-pruned scan, Arrow-batched, no
    per-row Python at the Spark level; narrow (no shuffle) — degree
    aggregations downstream shuffle on the host key only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, links = [], []
            for page_url, raw in zip(pdf["url"], pdf["html"]):
                if raw is None:
                    continue
                for link in sorted(outlinks_of(page_url, decode_html(bytes(raw)))):
                    urls.append(page_url)
                    links.append(link)
            yield pd.DataFrame({"url": urls, "outlink": links})

    return pages.select("url", "html").mapInPandas(run, schema="url string, outlink string")


def host_pagerank(
    edges: DataFrame,
    iterations: int = 4,
    scale: int = 10**9,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted host-level PageRank over (src_host, dst_host, n_links)
    edges -> (host, rank): the crawl-frontier / quality prior the
    sampling operators weight by (reference has no analog; this is a
    beyond-the-reference training-pipeline op).

    INTEGER-EXACT by spec, like the forecast fits: rank lives in
    ``scale`` fixed-point units and every step is int64 arithmetic —
    ``r0 = scale div n``; per edge ``contrib = (rank * w) div wtot``;
    per node ``rank' = ((100-damping_pct) * r0) div 100 +
    (damping_pct * sum(contrib)) div 100``. Integer sums are exactly
    associative, so the result is bit-identical across engines and
    shuffle orders — no float whose accumulation order could differ
    (CLAUDE.md invariant). Division is truncating on both engines
    (Spark ``div`` vs DuckDB ``//``) and every operand is nonnegative,
    so trunc == floor. Dangling hosts (no outlinks) drop their mass —
    the classic sink-drop simplification; their rank decays toward the
    teleport floor, which is the desired "no evidence" prior.

    Overflow bound: total mass never exceeds ``scale`` (teleport sum +
    damped inflow <= scale), so ``rank * w`` needs ``max(n_links) <
    2^63 / scale`` (~9.2e9 at the default scale) — beyond any real
    host's outdegree.

    Scale shape: the edge+weight table is built once, persisted, and
    reused every superstep (one shuffle on src to attach wtot); each
    iteration is one join-on-src (co-partitioned with the persisted
    side) plus one groupBy(dst) shuffle — the canonical PageRank plan.
    Per-iteration eager localCheckpoint keeps the logical plan
    constant-size (the measured exponential-lineage blowup in
    PERF.md); previous rounds' blocks are released deterministically.
    """
    from ocr_application_spark.session import release_local_checkpoint

    iterations = int(iterations)
    if not 1 <= iterations <= 50:
        raise ValueError(f"iterations must be in [1, 50], got {iterations}")
    if not 0 < int(damping_pct) < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    damping_pct = int(damping_pct)
    scale = int(scale)
    if scale < 100:
        # the integer spec needs nonnegative operands (trunc == floor)
        # and enough fixed-point resolution for div-by-100 teleport math
        raise ValueError(f"scale must be >= 100, got {scale}")

    # canonicalize duplicate (src, dst) rows FIRST: floor division is
    # not additive, so (r*w1) div W + (r*w2) div W != (r*(w1+w2)) div W
    # — merging makes the result independent of input row granularity
    # (host_link_edges output is already merged; this is a cheap
    # re-group for it, a correctness step for raw edge lists).
    # Weights must be strictly positive: w <= 0 would make wtot 0 (a
    # silent NULL-div mass drop on Spark, an error on the oracle side)
    # or negative (breaking trunc == floor) — fail per-row instead,
    # inside the existing scan (no extra pass)
    w_checked = F.when(
        F.col("n_links").cast("long") > 0, F.col("n_links").cast("long")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "host_pagerank: n_links must be > 0 (edge %s -> %s has %s)",
                F.col("src_host"),
                F.col("dst_host"),
                F.col("n_links").cast("string"),
            )
        ).cast("long")
    )
    e = (
        edges.select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
            w_checked.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    wt = e.groupBy("src").agg(F.sum("w").alias("wtot"))
    ew = e.join(wt, "src").persist()
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("host"))
        .persist()
    )
    n = nodes.count()  # scalar driver action: one long, like lineage's resume set
    spark = edges.sparkSession
    if n == 0:
        ew.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "host string, rank long")
    # ONE canonical op sequence, mirrored verbatim in the SQL oracle:
    # r0 = scale div n, then teleport = ((100-d) * r0) div 100
    r0 = scale // n
    teleport = ((100 - damping_pct) * r0) // 100
    r = nodes.select("host", F.lit(r0).cast("long").alias("rank"))
    prev = None
    for _ in range(iterations):
        inflow = (
            ew.join(r, ew.src == r.host)
            .select(F.col("dst"), F.expr("(rank * w) div wtot").alias("c"))
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("c").alias("m"))
        )
        r = (
            nodes.join(inflow, "host", "left")
            .select(
                "host",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(m, 0L)) div 100")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            release_local_checkpoint(prev)
        prev = r
    # the final checkpoint is materialized; the loop inputs are dead
    ew.unpersist()
    nodes.unpersist()
    return r


def host_hits(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Weighted HITS (Kleinberg 1999) over (src_host, dst_host, n_links)
    edges -> (host, hub, authority): the complement of PageRank's
    global prior — hubs are pages that POINT AT good content (link
    directories, aggregators: high hub, low authority ⇒ crawl them for
    frontier discovery, downweight them as training text), authorities
    are what good hubs point at.

    INTEGER-EXACT by spec, same discipline as ``host_pagerank``: scores
    live in ``scale`` fixed-point units, every step int64. ONE canonical
    iteration sequence, mirrored verbatim in the SQL oracle:

      a_raw(v) = sum over in-edges of w * h(u)      (exact int sum)
      a(v)     = (scale * a_raw(v)) div sum(a_raw)  (L1 normalize)
      h_raw(u) = sum over out-edges of w * a(v)     (uses the NEW a)
      h(u)     = (scale * h_raw(u)) div sum(h_raw)

    Division only happens at the two normalizations, AFTER the exact
    integer sums — so unlike PageRank's per-edge floor division the
    result here is independent of duplicate-edge granularity; edges are
    still pre-merged to cut shuffle volume. All operands nonnegative ⇒
    trunc == floor == DuckDB ``//``. Overflow bound: scores <= scale
    after each norm, so ``scale * a_raw <= scale^2 * w_total`` needs
    ``w_total < 2^63 / scale^2`` (~9.2e6 total link mass at the default
    scale — raise scale only with a tighter graph bound).

    Scale shape: the merged edge table is persisted once; each
    iteration is two join+groupBy shuffles (in-phase keyed on dst,
    out-phase on src) plus two single-row normalization aggregates that
    ride a broadcast cross-join (never a driver collect). Per-iteration
    eager localCheckpoint pins the lineage like the PageRank loop.
    """
    from ocr_application_spark.session import release_local_checkpoint

    iterations = int(iterations)
    if not 1 <= iterations <= 50:
        raise ValueError(f"iterations must be in [1, 50], got {iterations}")
    scale = int(scale)
    if scale < 100:
        raise ValueError(f"scale must be >= 100, got {scale}")

    w_checked = F.when(
        F.col("n_links").cast("long") > 0, F.col("n_links").cast("long")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "host_hits: n_links must be > 0 (edge %s -> %s has %s)",
                F.col("src_host"),
                F.col("dst_host"),
                F.col("n_links").cast("string"),
            )
        ).cast("long")
    )
    e = (
        edges.select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
            w_checked.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    nodes = (
        e.select("src")
        .union(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("host"))
        .persist()
    )
    n = nodes.count()  # scalar driver action, like host_pagerank's
    spark = edges.sparkSession
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "host string, hub long, authority long")
    h0 = scale // n
    state = nodes.select(
        "host",
        F.lit(h0).cast("long").alias("hub"),
        F.lit(h0).cast("long").alias("authority"),
    )
    prev = None

    def _phase(score: DataFrame, key_in: str, key_out: str, name: str) -> DataFrame:
        # raw(v) = sum of w * score(u) over edges keyed u=key_in, v=key_out;
        # then L1-normalize to `scale` fixed-point via a broadcast 1-row sum
        raw = (
            e.join(score, e[key_in] == score["host"])
            .select(F.col(key_out).alias("host"), (F.col("w") * F.col("s")).alias("x"))
            .groupBy("host")
            .agg(F.sum("x").alias("raw"))
        )
        tot = raw.agg(F.sum("raw").alias("tot"))
        return (
            nodes.join(raw, "host", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "host",
                F.when(
                    F.col("tot").isNull() | (F.col("tot") == 0), F.lit(0).cast("long")
                )
                .otherwise(F.expr("(cast(%d as bigint) * coalesce(raw, 0L)) div tot" % scale))
                .alias(name),
            )
        )

    for _ in range(iterations):
        # checkpoint `a` eagerly: the hub phase AND the state join both
        # consume it — unchecked, each iteration would recompute the
        # authority phase twice
        a = _phase(
            state.select("host", F.col("hub").alias("s")), "src", "dst", "authority"
        ).localCheckpoint(eager=True)
        h = _phase(a.select("host", F.col("authority").alias("s")), "dst", "src", "hub")
        state = (
            h.join(a, "host")
            .select("host", "hub", "authority")
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(a)
        if prev is not None:
            release_local_checkpoint(prev)
        prev = state
    e.unpersist()
    nodes.unpersist()
    return state


def host_link_edges(links: DataFrame) -> DataFrame:
    """(url, outlink) -> host-graph edges (src_host, dst_host, n_links):
    the crawl-frontier feature table (inter-host edges find new hosts;
    intra-host degree feeds boilerplate/hub heuristics). One shuffle,
    keyed on the (src, dst) pair; at crawl scale pre-aggregate per
    partition rides the hash-agg map side for free."""
    return (
        links.select(
            F.parse_url("url", F.lit("HOST")).alias("src_host"),
            F.parse_url("outlink", F.lit("HOST")).alias("dst_host"),
        )
        .filter(F.col("dst_host").isNotNull() & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
