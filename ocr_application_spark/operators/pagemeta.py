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
