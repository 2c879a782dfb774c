"""Page-level HTML metadata: head extraction + the in-page REP gate.

Two extraction-tier operators a Common-Crawl pipeline needs between raw
HTML and the URL/index layers, neither of which the reference has (its
FastAPI path consumes pre-decoded document text with no web metadata —
extraction_service/app/main.py takes an upload, not a crawl record):

1. ``extract_page_meta`` — pull <title>, the <html lang> hint,
   <link rel=canonical href>, and <meta name=robots content> out of the
   document head. The canonical href is the *page's own* vote on its
   identity and feeds ``urlops.canonical_url`` (server-declared
   canonical beats string normalization when both exist); the lang
   attribute is the cheap prior in front of
   ``textfns.text_langid_heuristic``.
2. ``page_index_gate`` — the page-level Robots Exclusion Protocol
   verdict: combine <meta name=robots> with the X-Robots-Tag response
   header (most restrictive wins, ``none`` = ``noindex, nofollow``),
   yielding per-page ``indexable``/``followable`` booleans. This is the
   third leg of the REP gate after robots.txt parsing
   (``urlops.robots_parse``) and rule matching
   (``urlops.robots_filter``): a crawler that obeys robots.txt but
   indexes noindex pages is still non-compliant.

Engine discipline: pure built-in ``regexp_extract`` projections —
codegen'd, zero shuffle, fuse into the scan at any corpus size. Every
pattern is ONE Python constant shared verbatim by the Spark expression
and the DuckDB oracle (both dialects accept the same `(?i)` RE2-safe
syntax: no lookaround, no backrefs; verified semantics: no-match
returns '' in both engines). The REP token test is a regex over the
comma-separated robots value — ``(^|,)[ ]*noindex[ ]*(,|$)`` — instead
of per-dialect list lambdas, so the twin expressions cannot diverge.

The fixture head is DERIVED deterministically from ``documents`` rows:
doc_id % 5 routes each doc through quote-style / tag-case / missing-
field / unquoted-attr variants and doc_id % 3 drives the X-Robots-Tag
header, so every extraction path and every gate combination is
genuinely exercised and value-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- shared patterns (one constant, two engines) -----------------------------

_TITLE_PAT = r"(?i)<title[^>]*>([^<]*)</title>"
_LANG_PAT = r'(?i)<html[^>]*[ \t]lang=["\']?([a-zA-Z-]+)'
# rel before href and href before rel both occur in the wild; extract
# both orders and coalesce (first non-empty wins).
_CANON_RH_PAT = (
    r'(?i)<link[^>]*rel=["\']?canonical["\']?[^>]*href=["\']?([^"\' >]+)'
)
_CANON_HR_PAT = (
    r'(?i)<link[^>]*href=["\']?([^"\' >]+)["\']?[^>]*rel=["\']?canonical'
)
_ROBOTS_PAT = r'(?i)<meta[^>]*name=["\']?robots["\']?[^>]*content=["\']?([^"\'>]+)'


def _tok_pat(token: str) -> str:
    """Regex matching one comma-separated REP token (whitespace-tolerant)
    inside an already-lowercased robots value."""
    return f"(^|,)[ ]*{token}[ ]*(,|$)"


def _sql_quote(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


# --- the head extractor (generic over any html string column) ---------------

def extract_page_meta(df: DataFrame, html_col: str = "html_text") -> DataFrame:
    """Append (title, html_lang, canonical_href, robots_content)
    extracted from an HTML string column. Missing fields come back as
    '' (the engines' shared no-match value) — never null, so downstream
    filters can compare without three-valued logic."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "title": F.regexp_extract(h, _TITLE_PAT, 1),
            "html_lang": F.regexp_extract(h, _LANG_PAT, 1),
            "canonical_href": F.coalesce(
                F.nullif(F.regexp_extract(h, _CANON_RH_PAT, 1), F.lit("")),
                F.regexp_extract(h, _CANON_HR_PAT, 1),
            ),
            "robots_content": F.regexp_extract(h, _ROBOTS_PAT, 1),
        }
    )


def _restricts(col: Column, token: str) -> Column:
    lowered = F.lower(F.trim(col))
    return lowered.rlike(_tok_pat(token)) | lowered.rlike(_tok_pat("none"))


def page_index_gate(
    df: DataFrame,
    robots_meta_col: str = "robots_content",
    header_col: str = "x_robots_tag",
) -> DataFrame:
    """Append (indexable, followable): the page-level REP verdict from
    the robots meta tag and the X-Robots-Tag header. Most restrictive
    source wins; ``none`` means ``noindex, nofollow`` (REP meta/header
    semantics); absent/empty values restrict nothing."""
    meta, hdr = F.col(robots_meta_col), F.col(header_col)
    return df.withColumns(
        {
            "indexable": ~(
                _restricts(meta, "noindex") | _restricts(hdr, "noindex")
            ),
            "followable": ~(
                _restricts(meta, "nofollow") | _restricts(hdr, "nofollow")
            ),
        }
    )


# --- deterministic fixture (twin expressions) --------------------------------
#
# doc_id % 5 variants:
#   0: double quotes, canonical link (rel-then-href), robots "index, follow"
#   1: UPPERCASE tags, single quotes, robots 'NOINDEX', href-then-rel canonical
#   2: no title, no robots meta, no canonical, no lang
#   3: unquoted attrs, robots none
#   4: extra attrs before lang, robots "nofollow, noarchive", no canonical
# doc_id % 3 header: '' / 'NOINDEX' / 'nofollow , noarchive'

_HEAD_SQL = """
    case cast(doc_id % 5 as int)
      when 0 then '<html lang="' || lang || '"><head><title>' || source
        || ' #' || cast(doc_id as varchar) || '</title>'
        || '<link rel="canonical" href="https://example.com/d/'
        || cast(doc_id // 2 as varchar) || '">'
        || '<meta name="robots" content="index, follow"></head>'
      when 1 then '<HTML LANG=''' || lang || '''><HEAD><TITLE>' || source
        || ' #' || cast(doc_id as varchar) || '</TITLE>'
        || '<LINK HREF=''https://example.com/d/'
        || cast(doc_id // 2 as varchar) || ''' REL=''canonical''>'
        || '<META NAME=''robots'' CONTENT=''NOINDEX''></HEAD>'
      when 2 then '<html><head><meta charset="utf-8"></head>'
      when 3 then '<html lang=' || lang || '><head><title>' || source
        || '</title><meta name=robots content=none></head>'
      else '<html class="x" data-v="1" lang="' || lang
        || '"><head><title>' || source
        || '</title><meta name="robots" content="nofollow, noarchive">'
        || '</head>'
    end
"""

_HDR_SQL = """
    case cast(doc_id % 3 as int)
      when 0 then ''
      when 1 then 'NOINDEX'
      else 'nofollow , noarchive'
    end
"""


def _fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    head = F.expr(
        _HEAD_SQL.replace("doc_id // 2", "cast(doc_id / 2 as bigint)")
        .replace("as varchar", "as string")
    )
    return docs.select(
        "doc_id", head.alias("html_text"), F.expr(_HDR_SQL).alias("x_robots_tag")
    )


def _meta_select_sql() -> str:
    canon_rh = f"regexp_extract(html_text, {_sql_quote(_CANON_RH_PAT)}, 1)"
    canon_hr = f"regexp_extract(html_text, {_sql_quote(_CANON_HR_PAT)}, 1)"
    return f"""
      regexp_extract(html_text, {_sql_quote(_TITLE_PAT)}, 1) as title,
      regexp_extract(html_text, {_sql_quote(_LANG_PAT)}, 1) as html_lang,
      coalesce(nullif({canon_rh}, ''), {canon_hr}) as canonical_href,
      regexp_extract(html_text, {_sql_quote(_ROBOTS_PAT)}, 1) as robots_content
    """


def _gate_sql(col: str, token: str) -> str:
    lowered = f"lower(trim({col}))"
    return (
        f"(regexp_matches({lowered}, {_sql_quote(_tok_pat(token))})"
        f" or regexp_matches({lowered}, {_sql_quote(_tok_pat('none'))}))"
    )


_META_ORACLE = f"""
    with fx as (
      select doc_id, {_HEAD_SQL} as html_text from documents
    )
    select doc_id, {_meta_select_sql()}
    from fx
"""

_GATE_ORACLE = f"""
    with fx as (
      select doc_id, {_HEAD_SQL} as html_text, {_HDR_SQL} as x_robots_tag
      from documents
    ),
    meta as (
      select doc_id, x_robots_tag, {_meta_select_sql()}
      from fx
    )
    select doc_id, robots_content, x_robots_tag,
      not ({_gate_sql('robots_content', 'noindex')}
           or {_gate_sql('x_robots_tag', 'noindex')}) as indexable,
      not ({_gate_sql('robots_content', 'nofollow')}
           or {_gate_sql('x_robots_tag', 'nofollow')}) as followable
    from meta
"""


@_q("page_meta_extract", _META_ORACLE)
def page_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fixture(spark, sf_dir)
    return extract_page_meta(fx).select(
        "doc_id", "title", "html_lang", "canonical_href", "robots_content"
    )


@_q("page_index_gate", _GATE_ORACLE)
def page_index_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fixture(spark, sf_dir)
    meta = extract_page_meta(fx)
    return page_index_gate(meta).select(
        "doc_id", "robots_content", "x_robots_tag", "indexable", "followable"
    )


# --- hreflang language-variant clusters ---------------------------------------
#
# Multilingual sites advertise their language variants with
# <link rel="alternate" hreflang="L" href="H"> head tags; a curation
# pass that dedups without them keeps N near-translations of the same
# page (or drops the one language it wanted). This op extracts each
# page's variant set and derives the CLUSTER identity locally — the
# x-default href when advertised, else the lexicographically smallest
# alternate href — which needs no join at all, because every compliant
# member lists the full set (Google's hreflang contract: annotations
# must be reciprocal). The only exchange in the plan is the window
# that counts how many crawled pages actually landed in each cluster.
#
# Fixture (shared SQL string, F.expr twin): docs group in threes
# (en/fr/de); doc_id%2 swaps attribute order, %11 drops the de
# annotation (a real-world partial-annotation page: its min-href
# fallback may then disagree with its siblings — deterministic in both
# engines, exactly how inconsistent annotations split real clusters),
# %7 omits x-default (forcing the fallback), %13 adds a
# rel="stylesheet" decoy carrying hreflang that the rel filter must
# drop.

_HL_TAG_PAT = r"(?i)<link[^>]*hreflang[^>]*>"
_HL_REL_PAT = r"(?i)rel=[\"']?alternate"
_HL_LANG_PAT = r"(?i)hreflang=[\"']?([a-zA-Z-]+)"
_HL_HREF_PAT = r"(?i)href=[\"']?([^\"' >]+)"

_HL_LANG_SQL = "case cast(doc_id % 3 as int) when 0 then 'en' when 1 then 'fr' else 'de' end"


def _hl_href_sql(lang_sql: str) -> str:
    return (
        "'https://h' || cast((doc_id - doc_id % 3) % 100 as varchar)"
        f" || '.example/' || {lang_sql} || '/'"
        " || cast(doc_id - doc_id % 3 as varchar)"
    )


def _hl_tag_sql(lang_sql: str) -> str:
    href = _hl_href_sql(lang_sql)
    return (
        "case when doc_id % 2 = 0 then"
        f" '<link rel=\"alternate\" hreflang=\"' || {lang_sql}"
        f" || '\" href=\"' || {href} || '\">'"
        f" else '<link href=''' || {href} || ''' hreflang=''' || {lang_sql}"
        " || ''' rel=''alternate''>' end"
    )


_HL_LINKS_SQL = (
    _hl_tag_sql("'en'")
    + " || " + _hl_tag_sql("'fr'")
    + " || case when doc_id % 11 = 0 then '' else " + _hl_tag_sql("'de'") + " end"
    + " || case when doc_id % 7 = 0 then '' else "
    + _hl_tag_sql("'x-default'").replace(
        _hl_href_sql("'x-default'"), _hl_href_sql("'en'")
    )
    + " end"
    + " || case when doc_id % 13 = 0 then"
    " '<link rel=\"stylesheet\" hreflang=\"en\" href=\"/style.css\">'"
    " else '' end"
)

_HL_FIXTURE_SQL = f"""
    select doc_id,
           {_hl_href_sql(_HL_LANG_SQL)} as url,
           '<html lang="' || {_HL_LANG_SQL} || '"><head>' || {_HL_LINKS_SQL}
             || '</head>' as html_text
    from documents
"""


def hreflang_clusters(df: DataFrame, html_col: str = "html_text",
                      url_col: str = "url") -> DataFrame:
    """(.., url, html) -> (doc_id, url, cluster_id, n_alts, is_head,
    cluster_size): the page's language-variant cluster, derived locally
    from its own annotations (see section comment)."""
    from pyspark.sql import Window

    tags = F.regexp_extract_all(F.col(html_col), F.lit(_HL_TAG_PAT), 0)
    alts = F.filter(tags, lambda t: t.rlike(_HL_REL_PAT))
    pairs = F.transform(
        alts,
        lambda t: F.struct(
            F.regexp_extract(t, _HL_LANG_PAT, 1).alias("lang"),
            F.regexp_extract(t, _HL_HREF_PAT, 1).alias("href"),
        ),
    )
    rl = F.filter(pairs, lambda s: s["lang"] != "x-default")
    xd = F.try_element_at(
        F.filter(pairs, lambda s: s["lang"] == "x-default"), F.lit(1)
    )["href"]
    row = df.select(
        "doc_id",
        url_col,
        F.coalesce(
            xd, F.array_min(F.transform(rl, lambda s: s["href"]))
        ).alias("cluster_id"),
        F.size(rl).cast("long").alias("n_alts"),
    )
    return row.select(
        "doc_id",
        url_col,
        "cluster_id",
        "n_alts",
        (F.col(url_col) == F.col("cluster_id")).alias("is_head"),
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .cast("long")
        .alias("cluster_size"),
    )


def _hl_lambda_sql() -> str:
    lang = f"regexp_extract(t, {_sql_quote(_HL_LANG_PAT)}, 1)"
    href = f"regexp_extract(t, {_sql_quote(_HL_HREF_PAT)}, 1)"
    return f"t -> {{'lang': {lang}, 'href': {href}}}"


_HL_ORACLE = f"""
    with fx as ({_HL_FIXTURE_SQL}),
    p as (
      select doc_id, url,
             list_transform(
               list_filter(
                 regexp_extract_all(html_text, {_sql_quote(_HL_TAG_PAT)}, 0),
                 t -> regexp_matches(t, {_sql_quote(_HL_REL_PAT)})),
               {_hl_lambda_sql()}) as prs
      from fx
    ),
    c as (
      select doc_id, url,
             list_filter(prs, s -> s.lang != 'x-default') as rl,
             (list_filter(prs, s -> s.lang = 'x-default'))[1].href as xd
      from p
    ),
    r as (
      select doc_id, url,
             coalesce(xd, list_min(list_transform(rl, s -> s.href))) as cluster_id,
             cast(len(rl) as bigint) as n_alts
      from c
    )
    select doc_id, url, cluster_id, n_alts,
           url = cluster_id as is_head,
           cast(count(*) over (partition by cluster_id) as bigint) as cluster_size
    from r
"""


@_q("page_hreflang_clusters", _HL_ORACLE)
def page_hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fx = docs.select(
        "doc_id",
        F.expr(_hl_href_sql(_HL_LANG_SQL).replace("as varchar", "as string")).alias("url"),
        F.expr(
            f"""'<html lang="' || {_HL_LANG_SQL} || '"><head>' || {_HL_LINKS_SQL}
             || '</head>'""".replace("as varchar", "as string")
        ).alias("html_text"),
    )
    return hreflang_clusters(fx)
