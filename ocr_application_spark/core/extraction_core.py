"""The deterministic extraction spec — single source of truth.

This module is the engine's analog of the reference's extraction stack:

* HTML branch  — replaces the reference's full-page VLM OCR
  (extraction_service/app/ocr/extractor.py:64-89, Qwen2-VL) with a
  deterministic Readability-style main-content scorer over the DOM:
  text-density vs link-density block scoring, with the reference's
  boilerplate kill-list behavior (nav/header/footer/aside dropped, like
  the field-name deny-list at layout_detector.py:143-171).
* PDF/layout branch — replaces PaddleOCR/EasyOCR word boxes
  (extractor.py:92-105) + filtering (layout_detector.py:235-277) +
  line sessionization (layout_detector.py:371-424) + reading-order
  reassembly (structurer.py:46-49) over span records embedded in the
  binary payload.
* passthrough branch — mirrors the JSON-decode fallback that wraps raw
  payloads (extraction_service/app/kafka/consumer.py:61-72).

Byte-identity contract (BASELINE.json): the Spark pipeline calls exactly
these functions inside Arrow-batched kernels; the pytest oracle calls them
eagerly in one process. Per-url SHA-256 of ``extracted_text`` must match.
Everything here is pure and order-independent per row — no globals, no
randomness, no wall-clock.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from html import unescape

# ---------------------------------------------------------------------------
# Tunables — mirrors of the reference's thresholds
# ---------------------------------------------------------------------------

PDF_MAGIC = b"%FPDF"

# layout_detector.py:258-259 — OCR confidence floor
CONF_FLOOR = 0.7
# layout_detector.py:262-263 — min text length
MIN_TEXT_LEN = 2
# layout_detection_service/app/config.py:19-21 — geometric box minimums
MIN_BOX_W = 15.0
MIN_BOX_H = 10.0
MIN_BOX_AREA = 150.0
# layout_detection_service/app/config.py:22 — line grouping y-tolerance
LINE_TOL = 15.0
# layout_detector.py:140-141 — Arabic-script drop predicate
ARABIC_RE = re.compile("[؀-ۿ]")

# Subtrees never contributing content (script/style) or treated as
# boilerplate (nav/header/footer/aside/form) — the webtext analog of the
# reference's banned-phrase deny-list (layout_detector.py:156-166).
KILL_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe",
     "nav", "header", "footer", "aside", "form", "button"}
)
# Elements whose text forms a block (one output line each).
BLOCK_TAGS = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
     "pre", "blockquote", "figcaption", "dt", "dd"}
)
# Candidate main-content containers, scored against each other.
CANDIDATE_TAGS = frozenset({"article", "main", "section", "div", "body"})

def _digit_count(s: str) -> int:
    """ASCII-digit count — ten C-level str.count passes, ~20x a per-char
    isdigit genexpr. Deliberately ASCII-only (deterministic spec choice),
    used by ALL THREE branches so the digit_ratio feature is consistent
    html/pdf/passthrough."""
    return sum(map(s.count, "0123456789"))


def _norm_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip.

    str.split() with no separator splits on arbitrary unicode-whitespace
    runs (same class as regex \\s) entirely in C — ~3x faster than
    re.sub(r'\\s+', ' ', s).strip() in the kernel hot path."""
    return " ".join(s.split())


def repair_mojibake(s: str) -> str:
    """Order-dependent double-replace, byte-for-byte as the reference.

    layout_detector.py:256 does ``.replace('??','é').replace('??','à')``;
    the second replace never fires after the first consumed all '??' —
    replicated exactly (lossy on purpose) for byte-identity.
    """
    return s.replace("??", "é").replace("??", "à").strip()


# ---------------------------------------------------------------------------
# HTML branch
# ---------------------------------------------------------------------------


@dataclass
class _Candidate:
    order: int
    blocks: list[str] = field(default_factory=list)
    text_chars: int = 0
    link_chars: int = 0
    p_count: int = 0

    def score(self) -> float:
        # Readability-style: reward text mass and paragraph density,
        # punish link-heavy (ad/nav) regions. All integer arithmetic on
        # deterministic counts -> no float-order sensitivity.
        return float(self.text_chars - 2 * self.link_chars + 20 * self.p_count)


# Tokenizer for the fast DOM walk below. Groups: close='/' for end tags,
# name=tag name, body=everything between name and '>' (self-closing iff
# body.rstrip() ends with '/'). Comment/doctype/PI/CDATA alternatives
# match-and-discard. Attribute values containing '>' are not
# special-cased (deterministic best-effort, same trade the reference's
# regex field extraction makes — tarification_pipeline.py:138-142).
#
# LINEAR-TIME GUARANTEE (poisoned-page guard): every variable-length run
# is possessive (*+ — no backtracking) and every construct accepts \Z as
# its terminator, so an unclosed tag/comment/doctype consumes the rest
# of the document as ONE match instead of each later '<' re-scanning to
# EOF. Without this, 60 KB of "<a " cost minutes (quadratic + regex
# backtracking); now parse time is O(len). Consume-to-EOF matches
# browser behavior: an EOF-truncated construct is discarded, never
# rendered as text (for a truncated named tag, `term` captures '' so the
# drivers skip its events too). The comment branch also accepts the
# HTML5 abruptly-closed forms `<!-->` and `<!--->` as complete comments
# instead of swallowing the rest of the page.
_TAG_RE = re.compile(
    r"<(?:"
    r"!--(?:>|->|.*?(?:--\s*>|\Z))"
    r"|!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|![^>]*+(?:>|\Z)"
    r"|\?[^>]*+(?:>|\Z)"
    r"|(?P<close>/\s*+)?(?P<name>[a-zA-Z][a-zA-Z0-9:_.-]*+)(?P<body>[^>]*+)(?P<term>>|\Z)"
    r")",
    re.S,
)
# script/style content is raw text (no tags/entities inside) — the same
# two elements stdlib html.parser treats as CDATA.
# the lookahead requires the tag NAME to end at the match ('</scripting>'
# or a JS literal '"</scriptx>"' must NOT leave raw mode — browsers end
# script CDATA only on '</script' followed by whitespace, '/' or '>')
_RAW_CLOSE = {
    t: re.compile(rf"</{t}(?=[\s/>])[^>]*+>", re.I) for t in ("script", "style")
}


class _MainContentParser:
    """Single-pass block collector with per-candidate scoring.

    Event semantics follow html.parser.HTMLParser(convert_charrefs=True)
    — handle_starttag/handle_endtag/handle_data — but driven by one
    C-regex scan (`run`): the stdlib parser's per-tag bookkeeping
    (updatepos, check_for_whole_start_tag, attribute parsing we never
    use) was 80% of kernel CPU, measured 3.4x slower end-to-end."""

    def __init__(self) -> None:
        self.kill_depth = 0
        self.link_depth = 0
        self.block_stack: list[list[str]] = []
        self.cand_stack: list[_Candidate] = []
        self.candidates: list[_Candidate] = []
        self.n_links = 0
        self.n_tables = 0
        self.n_inputs = 0
        self.order = 0

    # -- structure ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        # structural counts are page-global (classifier features) — they
        # include boilerplate regions on purpose (nav/footer link mass is
        # itself a class signal)
        if tag == "a":
            self.n_links += 1
        elif tag == "table":
            self.n_tables += 1
        elif tag in ("input", "select", "textarea", "button"):
            self.n_inputs += 1
        if tag in KILL_TAGS:
            self.kill_depth += 1
            return
        if self.kill_depth:
            return
        if tag == "a":
            self.link_depth += 1
        if tag in CANDIDATE_TAGS:
            self.order += 1
            cand = _Candidate(order=self.order)
            self.cand_stack.append(cand)
            self.candidates.append(cand)
        if tag in BLOCK_TAGS:
            self.block_stack.append([])

    def handle_endtag(self, tag):
        if tag in KILL_TAGS:
            self.kill_depth = max(0, self.kill_depth - 1)
            return
        if self.kill_depth:
            return
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag in BLOCK_TAGS and self.block_stack:
            parts = self.block_stack.pop()
            # parts are whitespace-free tokens (handle_data pre-splits),
            # so the single join IS the normalized block text
            text = " ".join(parts)
            if text:
                for cand in self.cand_stack:
                    cand.blocks.append(text)
                    if tag == "p":
                        cand.p_count += 1
        if tag in CANDIDATE_TAGS and self.cand_stack:
            self.cand_stack.pop()

    # -- text --------------------------------------------------------------
    def handle_data(self, data):
        if self.kill_depth or not data:
            return
        parts = data.split()
        if parts:
            # blocks buffer tokens, not raw chunks: ws-normalization then
            # happens once here instead of re-splitting the whole block
            # text at the end tag (== _norm_ws(" ".join(raw_chunks)))
            if self.block_stack:
                self.block_stack[-1].extend(parts)
            # == len(_norm_ws(data)) without building the joined string
            n = sum(map(len, parts)) + len(parts) - 1
            for cand in self.cand_stack:
                cand.text_chars += n
                if self.link_depth:
                    cand.link_chars += n

    # -- drivers -----------------------------------------------------------
    def run_dispatch(self, html: str) -> None:
        """Reference driver: one-pass regex tokenize + method dispatch.

        Kept as the readable spec of the event semantics; ``run`` below
        is the hot-path twin with the same events inlined as closures
        over local state (method-call + self-attribute overhead was
        ~20% of kernel CPU at ~75 events/doc). A differential pytest
        (test_extraction_core.py) holds the two byte-identical."""
        pos = 0
        search = _TAG_RE.search
        unescape_needed = "&" in html
        while True:
            m = search(html, pos)
            if m is None:
                break
            start = m.start()
            if start > pos:
                data = html[pos:start]
                if unescape_needed and "&" in data:
                    data = unescape(data)
                self.handle_data(data)
            pos = m.end()
            close, name, body, term = m.group("close", "name", "body", "term")
            if name is None:  # comment / doctype / PI / CDATA
                continue
            if term == "":  # EOF-truncated tag: discard (browser behavior)
                continue
            selfc = body.rstrip().endswith("/") if body else False
            name = name.lower()
            if close:
                self.handle_endtag(name)
                continue
            self.handle_starttag(name, ())
            if selfc:
                self.handle_endtag(name)
            elif name in _RAW_CLOSE:
                closer = _RAW_CLOSE[name].search(html, pos)
                if closer is None:  # unterminated raw element: rest is CDATA
                    self.handle_data(html[pos:])
                    self.handle_endtag(name)
                    return
                self.handle_data(html[pos : closer.start()])
                self.handle_endtag(name)
                pos = closer.end()
        if pos < len(html):
            data = html[pos:]
            if unescape_needed and "&" in data:
                data = unescape(data)
            self.handle_data(data)

    def run(self, html: str) -> None:
        """Hot-path driver: same events as ``run_dispatch``, fully inlined
        over pure locals (written back once at the end).

        Two event identities let the inline version skip work the
        dispatch version provably throws away:
        * raw elements (script/style) are KILL_TAGS, so kill_depth >= 1
          for their entire content — every ``handle_data`` inside is a
          no-op; only the kill_depth decrement of the end tag survives;
        * data arriving while kill_depth > 0 is dropped by handle_data,
          so the slice + unescape preceding it can be skipped.
        The differential property test pins run == run_dispatch."""
        pos = 0
        search = _TAG_RE.search
        unescape_needed = "&" in html
        kill_depth = self.kill_depth
        link_depth = self.link_depth
        block_stack = self.block_stack
        cand_stack = self.cand_stack
        candidates = self.candidates
        n_links = self.n_links
        n_tables = self.n_tables
        n_inputs = self.n_inputs
        order = self.order
        kill_tags, block_tags, cand_tags = KILL_TAGS, BLOCK_TAGS, CANDIDATE_TAGS

        # try/finally: an exception escaping mid-scan must still write the
        # counters back (extract_html's contract keeps whatever was
        # collected before a malformed region — run_dispatch updates self
        # incrementally, so the inlined twin must not lose state either)
        try:
          while True:
              m = search(html, pos)
              if m is None:
                  break
              start, end = m.span()
              if start > pos and not kill_depth:
                  # == handle_data (between-tags site)
                  data = html[pos:start]
                  if unescape_needed and "&" in data:
                      data = unescape(data)
                  parts = data.split()
                  if parts:
                      if block_stack:
                          block_stack[-1].extend(parts)
                      nch = sum(map(len, parts)) + len(parts) - 1
                      for cand in cand_stack:
                          cand.text_chars += nch
                          if link_depth:
                              cand.link_chars += nch
              pos = end
              close, name, body, term = m.group(1, 2, 3, 4)  # close/name/body/term
              if name is None:  # comment / doctype / PI / CDATA
                  continue
              if term == "":  # EOF-truncated tag: discard (browser behavior)
                  continue
              selfc = body.rstrip().endswith("/") if body else False
              name = name.lower()
              if close:
                  # == handle_endtag
                  if name in kill_tags:
                      if kill_depth > 0:
                          kill_depth -= 1
                  elif not kill_depth:
                      if name == "a":
                          if link_depth > 0:
                              link_depth -= 1
                      if name in block_tags and block_stack:
                          parts = block_stack.pop()
                          text = " ".join(parts)  # tokens: join == normalize
                          if text:
                              is_p = name == "p"
                              for cand in cand_stack:
                                  cand.blocks.append(text)
                                  if is_p:
                                      cand.p_count += 1
                      if name in cand_tags and cand_stack:
                          cand_stack.pop()
                  continue
              # == handle_starttag (structural counts are page-global)
              if name == "a":
                  n_links += 1
              elif name == "table":
                  n_tables += 1
              elif name in ("input", "select", "textarea", "button"):
                  n_inputs += 1
              if name in kill_tags:
                  kill_depth += 1
                  if selfc:  # self-closed kill tag: immediate end event
                      kill_depth -= 1
                  elif name in _RAW_CLOSE:
                      # raw content: kill_depth >= 1, so data events inside
                      # are no-ops — just skip to the closer and pop kill
                      closer = _RAW_CLOSE[name].search(html, pos)
                      if closer is None:  # unterminated: rest is dropped CDATA
                          kill_depth -= 1
                          pos = len(html)
                          break
                      kill_depth -= 1
                      pos = closer.end()
                  continue
              if not kill_depth:
                  if name == "a":
                      link_depth += 1
                  if name in cand_tags:
                      order += 1
                      cand = _Candidate(order=order)
                      cand_stack.append(cand)
                      candidates.append(cand)
                  if name in block_tags:
                      block_stack.append([])
              if selfc:
                  # == handle_endtag for the self-closed tag (not a kill tag)
                  if not kill_depth:
                      if name == "a":
                          if link_depth > 0:
                              link_depth -= 1
                      if name in block_tags and block_stack:
                          parts = block_stack.pop()
                          text = " ".join(parts)  # tokens: join == normalize
                          if text:
                              is_p = name == "p"
                              for cand in cand_stack:
                                  cand.blocks.append(text)
                                  if is_p:
                                      cand.p_count += 1
                      if name in cand_tags and cand_stack:
                          cand_stack.pop()
          if pos < len(html) and not kill_depth:
              # == handle_data (tail site)
              data = html[pos:]
              if unescape_needed and "&" in data:
                  data = unescape(data)
              parts = data.split()
              if parts:
                  if block_stack:
                      block_stack[-1].extend(parts)
                  nch = sum(map(len, parts)) + len(parts) - 1
                  for cand in cand_stack:
                      cand.text_chars += nch
                      if link_depth:
                          cand.link_chars += nch
        finally:
            self.kill_depth = kill_depth
            self.link_depth = link_depth
            self.n_links = n_links
            self.n_tables = n_tables
            self.n_inputs = n_inputs
            self.order = order


def sniff_charset(raw: bytes) -> str:
    """Charset from the first 1024 bytes' meta tag, default utf-8."""
    head = raw[:1024].lower()
    for needle in (
        b"charset=iso-8859-1",
        b'charset="iso-8859-1"',
        b"charset='iso-8859-1'",
        b"charset=latin-1",
        b'charset="latin-1"',
        b"charset='latin-1'",
    ):
        if needle in head:
            return "iso-8859-1"
    return "utf-8"


def decode_html(raw: bytes) -> str:
    enc = sniff_charset(raw)
    try:
        return raw.decode(enc)
    except UnicodeDecodeError:
        return raw.decode(enc, errors="replace")


def extract_html(raw: bytes) -> tuple[str, dict]:
    """Main-content text from HTML bytes + DOM features for the classifier.

    Deterministic Readability-style scoring: best candidate container by
    (text_chars - 2*link_chars + 20*p_count); ties broken by document
    order (earliest wins). Returns ('', feats) for block-less pages.
    """
    html = decode_html(raw)
    parser = _MainContentParser()
    try:
        parser.run(html)
    except Exception:
        pass  # keep whatever was collected before the malformed region
    best: _Candidate | None = None
    for cand in parser.candidates:
        if not cand.blocks:
            continue
        # candidates iterate in increasing start-tag order, so strict >
        # already resolves score ties earliest-candidate-wins
        if best is None or cand.score() > best.score():
            best = cand
    text = "\n".join(best.blocks) if best else ""
    text = repair_mojibake(text)
    # link_density is deliberately the FIRST candidate's ratio (the
    # outermost container, usually <body>): a page-level boilerplate
    # signal for the classifier, vs. text_len/digit_ratio which describe
    # the winning candidate's extracted text
    first = parser.candidates[0] if parser.candidates else None
    feats = {
        "n_links": float(parser.n_links),
        "n_tables": float(parser.n_tables),
        "n_inputs": float(parser.n_inputs),
        "text_len": float(len(text)),
        "link_density": float(
            first.link_chars / (first.text_chars or 1) if first else 0.0
        ),
        "digit_ratio": float(_digit_count(text) / max(1, len(text))),
    }
    return text, feats


# ---------------------------------------------------------------------------
# PDF / layout branch
# ---------------------------------------------------------------------------


def parse_pdf_payload(raw: bytes) -> tuple[float, list[dict]]:
    """Decode the fake-PDF span container.

    Format: b'%FPDF1 <page_width>\\n' then one JSON object per line:
    {"page":int,"x0":f,"y0":f,"x1":f,"y1":f,"conf":f,"text":str}.
    Mirrors the reference's text_regions shape (extractor.py:101-105).
    Undecodable OR structurally invalid lines are skipped (consumer.py:
    30-33 skip-on-error): a line that parses as JSON but is not a dict
    with numeric geometry and string text (e.g. 'null', '[1]',
    '{"x0":1}') must not survive into the filter/line kernels, where it
    would raise mid-task instead of being skipped.
    """
    body = raw.decode("utf-8", errors="replace")
    lines = body.split("\n")
    header = lines[0].split()
    try:
        page_width = float(header[1]) if len(header) > 1 else 1000.0
    except ValueError:
        page_width = 1000.0
    spans = []
    for ln in lines[1:]:
        ln = ln.strip()
        if not ln:
            continue
        try:
            s = json.loads(ln)
            if not isinstance(s, dict):
                continue
            for k in ("x0", "y0", "x1", "y1"):
                float(s[k])  # KeyError/TypeError/ValueError -> skip line
            float(s.get("conf", 1.0))
            int(s.get("page", 0))
            if not isinstance(s.get("text", ""), str):
                continue
            spans.append(s)
        except Exception:
            continue
    return page_width, spans


def span_passes_filters(s: dict) -> bool:
    """F1+F3+F4+F5 record filters, exactly the reference's thresholds."""
    text = s.get("text") or ""
    if float(s.get("conf", 1.0)) < CONF_FLOOR:  # F1 layout_detector.py:258
        return False
    if ARABIC_RE.search(text):  # F3 layout_detector.py:260
        return False
    if len(text.strip()) < MIN_TEXT_LEN:  # F4 layout_detector.py:262
        return False
    w = float(s["x1"]) - float(s["x0"])
    h = float(s["y1"]) - float(s["y0"])
    if w < MIN_BOX_W or h < MIN_BOX_H or w * h < MIN_BOX_AREA:  # F5
        return False
    return True


def group_lines(spans: list[dict], page_width: float) -> list[list[dict]]:
    """Gap-based line sessionization + midline column split.

    Replicates layout_detector.py:371-424: sort by center-y; a new line
    starts when |center_y - ref_y| > 15 (config.py:22); each line is then
    split at page_width/2 into left/right groups, left first. Explicit
    (page, cy, cx, text) tie-breakers make the grouping order-stable
    under parallelism (SURVEY §7 hard-part (c)).
    """
    def cy(s):
        return (float(s["y0"]) + float(s["y1"])) / 2.0

    def cx(s):
        return (float(s["x0"]) + float(s["x1"])) / 2.0

    spans = sorted(spans, key=lambda s: (int(s.get("page", 0)), cy(s), cx(s), s["text"]))
    lines: list[list[dict]] = []
    cur: list[dict] = []
    ref_y = None
    ref_page = None
    for s in spans:
        if cur and (int(s.get("page", 0)) != ref_page or abs(cy(s) - ref_y) > LINE_TOL):
            lines.append(cur)
            cur = []
        if not cur:
            ref_y = cy(s)
            ref_page = int(s.get("page", 0))
        cur.append(s)
    if cur:
        lines.append(cur)
    # midline split: left column then right column (layout_detector.py:404-418)
    out: list[list[dict]] = []
    half = page_width / 2.0
    for line in lines:
        left = [s for s in line if cx(s) < half]
        right = [s for s in line if cx(s) >= half]
        for grp in (left, right):
            if grp:
                grp.sort(key=lambda s: (float(s["x0"]), s["text"]))
                out.append(grp)
    return out


def extract_pdf(raw: bytes) -> tuple[str, dict]:
    """Bounding-box-ordered text reassembly (W1+W2 over K7-style spans)."""
    page_width, spans = parse_pdf_payload(raw)
    kept = [s for s in spans if span_passes_filters(s)]
    lines = group_lines(kept, page_width)
    text = "\n".join(" ".join(_norm_ws(s["text"]) for s in grp) for grp in lines)
    text = repair_mojibake(text)
    feats = {
        "n_links": 0.0,
        "n_tables": 0.0,
        "n_inputs": 0.0,
        "text_len": float(len(text)),
        "link_density": 0.0,
        "digit_ratio": float(_digit_count(text) / max(1, len(text))),
    }
    return text, feats


# ---------------------------------------------------------------------------
# Entry point — one document in, one record out
# ---------------------------------------------------------------------------

FEATURE_NAMES = ("n_links", "n_tables", "n_inputs", "text_len", "link_density", "digit_ratio")


def extract_document(html: bytes | None, text: str | None) -> dict:
    """Extract one document. Pure; the unit of byte-identity.

    Branching mirrors the reference's JSON-decode fallback
    (extraction_service/app/kafka/consumer.py:61-72): binary payloads go
    to the layout branch, missing payloads fall back to the pre-extracted
    text column, errors produce an error envelope (extractor.py:135-139)
    rather than dropping the row.
    """
    try:
        if html is not None and len(html) > 0:
            if bytes(html[:5]) == PDF_MAGIC:
                out, feats = extract_pdf(bytes(html))
                method = "pdf"
            else:
                out, feats = extract_html(bytes(html))
                method = "html"
        elif text is not None:
            out = repair_mojibake(_norm_ws(text))
            feats = dict.fromkeys(FEATURE_NAMES, 0.0)
            feats["text_len"] = float(len(out))
            feats["digit_ratio"] = float(_digit_count(out) / max(1, len(out)))
            method = "passthrough"
        else:
            out, feats, method = "", dict.fromkeys(FEATURE_NAMES, 0.0), "empty"
        status = "success"
    except Exception as exc:  # error envelope, never lose the row
        out, feats, method, status = "", dict.fromkeys(FEATURE_NAMES, 0.0), f"error:{type(exc).__name__}", "error"
    digest = hashlib.sha256(out.encode("utf-8")).hexdigest()
    return {
        "extracted_text": out,
        "digest": digest,
        "method": method,
        "status": status,
        "n_chars": len(out),
        "features": [feats[k] for k in FEATURE_NAMES],
    }
