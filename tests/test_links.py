"""Outlink kernel (kernels/links.py): differential vs stdlib html.parser,
hostile-input linearity, host-graph edges."""

import time


def _reference_outlinks(page_url: str, html_text: str) -> set[str]:
    """Independent reference: stdlib HTMLParser attribute parsing (which
    unescapes entities natively) + the same urljoin/urldefrag/scheme
    rules — what a from-scratch implementation would do without the
    regex fast path."""
    from html.parser import HTMLParser
    from urllib.parse import urldefrag, urljoin

    out: set[str] = set()

    class P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            if tag != "a":
                return
            for k, v in attrs:
                if k != "href" or v is None:
                    continue
                raw = v.strip()
                if not raw or raw.startswith("#"):
                    continue
                if raw.lower().startswith(("javascript:", "mailto:", "data:", "tel:")):
                    continue
                link, _ = urldefrag(urljoin(page_url, raw))
                if link:
                    out.add(link)

    p = P(convert_charrefs=True)
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    return out


_CASES = [
    '<a href="/abs/path">x</a>',
    "<a href='/single/quoted'>x</a>",
    "<a href=bare/token>x</a>",
    '<a href="relative/page.html">x</a>',
    '<a href="../up/one">x</a>',
    '<a href="https://other.example/full">x</a>',
    '<a href="//proto.example/relative">x</a>',
    '<a href="#fragment-only">x</a>',
    '<a href="/page#frag">keeps path, drops frag</a>',
    '<a href="mailto:a@b.c">skip</a><a href="javascript:void(0)">skip</a>',
    '<a href="/dup">1</a><a href="/dup">2</a>',
    '<a class="x" id="y" href="/attrs/after">x</a>',
    '<a href="/q?a=1&amp;b=2">entity in href</a>',
    '<a href = "/spaced/equals">x</a>',
    "<a href=''>empty</a><a>no href</a>",
    '<A HREF="/upper/case">x</A>',
    "text &lt;a href=&quot;/escaped/not-a-tag&quot;&gt; more text",
    '<p><a href="/nested"><b>deep</b></a></p><a href="/self-close"/>',
    '<a data-href="/not-href" href="/real">x</a>',
]


def test_outlinks_match_htmlparser_reference():
    """The regex kernel must agree with the html.parser reference on
    every adversarial shape (quoting styles, relative resolution,
    fragments, skip-schemes, entities, escaped text, casing)."""
    from ocr_application_spark.kernels.links import outlinks_of

    base = "https://host7.example/dir/page.html"
    for html_text in _CASES:
        got = outlinks_of(base, html_text)
        want = _reference_outlinks(base, html_text)
        assert got == want, (html_text, got, want)
    # and the concatenation of everything at once
    soup = "".join(_CASES)
    assert outlinks_of(base, soup) == _reference_outlinks(base, soup)


def test_links_linear_on_hostile_input():
    """240 KB of unclosed '<a href=' openers must parse in well under a
    second — the possessive-quantifier discipline from the extraction
    tokenizer (a poisoned page must never stall an executor task)."""
    from ocr_application_spark.kernels.links import outlinks_of

    hostile = '<a href="' * 30_000  # never-closed attribute openers
    t0 = time.monotonic()
    outlinks_of("https://h.example/", hostile)
    assert time.monotonic() - t0 < 1.0
    hostile2 = "<a " * 60_000 + 'href="/x">'  # unclosed tag heads
    t0 = time.monotonic()
    outlinks_of("https://h.example/", hostile2)
    assert time.monotonic() - t0 < 1.0


def test_extract_outlinks_and_host_edges(spark):
    """End-to-end over a DataFrame: per-page distinct resolved links and
    the host-graph edge aggregation (intra- and inter-host)."""
    from ocr_application_spark.kernels.links import extract_outlinks, host_link_edges

    rows = [
        (
            "https://a.example/news/1",
            '<a href="/home">h</a><a href="story2">s</a>'
            '<a href="https://b.example/x">b</a><a href="/home#top">dup-after-defrag</a>'.encode(),
        ),
        (
            "https://b.example/",
            '<a href="https://a.example/back">a</a><a href="/self">s</a>'.encode(),
        ),
        ("https://c.example/", b"<p>no links at all</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    links = {(r.url, r.outlink) for r in extract_outlinks(pages).collect()}
    assert links == {
        ("https://a.example/news/1", "https://a.example/home"),
        ("https://a.example/news/1", "https://a.example/news/story2"),
        ("https://a.example/news/1", "https://b.example/x"),
        ("https://b.example/", "https://a.example/back"),
        ("https://b.example/", "https://b.example/self"),
    }
    edges = {
        (r.src_host, r.dst_host, r.n_links)
        for r in host_link_edges(extract_outlinks(pages)).collect()
    }
    assert edges == {
        ("a.example", "a.example", 2),
        ("a.example", "b.example", 1),
        ("b.example", "a.example", 1),
        ("b.example", "b.example", 1),
    }


def test_outlinks_on_synth_corpus(spark):
    """The deterministic synthetic crawl corpus: every page's extracted
    links agree with the reference parser on the raw html (value-level,
    500 pages) — the kernel vs reference differential at corpus scale."""
    from ocr_application_spark.core.extraction_core import decode_html
    from ocr_application_spark.kernels.links import extract_outlinks, outlinks_of
    from ocr_application_spark.sources.webpages import synth_pages

    pages = synth_pages(spark, 500)
    got: dict = {}
    for r in extract_outlinks(pages).collect():
        got.setdefault(r.url, set()).add(r.outlink)
    rows = pages.select("url", "html").collect()
    n_checked = 0
    for r in rows:
        if r.html is None:  # the corpus' pdf/text-payload rows carry no html
            assert r.url not in got
            continue
        want = _reference_outlinks(r.url, decode_html(bytes(r.html)))
        assert got.get(r.url, set()) == want, r.url
        assert outlinks_of(r.url, decode_html(bytes(r.html))) == want
        n_checked += 1
    assert n_checked >= 400  # the corpus is html-dominated


def _reference_anchors(page_url: str, html_text: str) -> set:
    """Independent anchor reference: html.parser events — every <a href>
    start opens a collector fed by data events; the first </a> end
    closes ALL open collectors (the regex spec's 'text to the first
    subsequent close'); a start-end tag (XHTML self-close) and an open
    that never closes yield anchor ''."""
    from html.parser import HTMLParser
    from urllib.parse import urldefrag, urljoin

    out: set = set()

    def _norm(parts) -> str:
        return " ".join("".join(parts).split())[:500]

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.open = []

        def _link(self, attrs):
            for k, v in attrs:
                if k != "href" or v is None:
                    continue
                raw = v.strip()
                if not raw or raw.startswith("#"):
                    return None
                if raw.lower().startswith(
                    ("javascript:", "mailto:", "data:", "tel:")
                ):
                    return None
                link, _ = urldefrag(urljoin(page_url, raw))
                return link or None
            return None

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                link = self._link(attrs)
                if link is not None:
                    self.open.append((link, []))

        def handle_startendtag(self, tag, attrs):
            if tag == "a":
                link = self._link(attrs)
                if link is not None:
                    out.add((link, ""))

        def handle_endtag(self, tag):
            if tag == "a":
                for link, parts in self.open:
                    out.add((link, _norm(parts)))
                self.open.clear()

        def handle_data(self, data):
            for _link, parts in self.open:
                parts.append(data)

    p = P()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        pass
    for link, _parts in p.open:  # unclosed opens: anchor ''
        out.add((link, ""))
    return out


_ANCHOR_CASES = [
    '<a href="/plain">plain text</a>',
    '<a href="/bold"><b>deep</b>er</a>',
    '<a href="/entity">a &amp; b &lt;c&gt;</a>',
    '<a href="/ws">  spaced \n  words  </a>',
    '<a href="/empty"></a>',
    '<a href="/img"><img src="x.png"></a>',
    '<a href="/outer">one<a href="/inner">two</a>',
    '<a href="/dupanchor">same</a><a href="/dupanchor">same</a>',
    '<a href="/twoanchors">first</a><a href="/twoanchors">second</a>',
    '<a href="/selfclose"/>after<a href="/next">n</a>',
    '<a href="/unclosed">never closed text',
    '<A HREF="/upper">UP</A>',
    '<a href="/q?a=1&amp;b=2">entity in href</a>',
    # real-web shapes where a naive tag-strip diverges from html.parser
    '<a href="/lt-text">5 < 6 and p <3 q</a>',
    '<a href="/quoted-gt"><img alt="a>b">tail</a>',
    '<a href="/split-entity">&am<b></b>p;</a>',
    '<a href="/comment">x<!-- a>b -->y</a>',
    '<a href="/pi">m <? pi ?> n</a>',
    '<a href="/slash-space" / >text</a>',
    '<a href="/slash-gt"/ >text</a>',
    "<a href=/bare/>bare-token-slash</a>",
]


def test_anchors_match_htmlparser_reference():
    from ocr_application_spark.kernels.links import anchors_of

    base = "https://host7.example/dir/page.html"
    for html_text in _ANCHOR_CASES:
        got = anchors_of(base, html_text)
        want = _reference_anchors(base, html_text)
        assert got == want, (html_text, got, want)
    soup = "".join(_ANCHOR_CASES)
    assert anchors_of(base, soup) == _reference_anchors(base, soup)
    # the outlink projection of the anchor kernel must agree with the
    # outlink kernel itself on the original adversarial corpus
    from ocr_application_spark.kernels.links import outlinks_of

    for html_text in _CASES + _ANCHOR_CASES:
        assert {l for l, _ in anchors_of(base, html_text)} == outlinks_of(
            base, html_text
        ), html_text


def test_anchors_linear_on_hostile_input():
    from ocr_application_spark.kernels.links import anchors_of

    t0 = time.monotonic()
    anchors_of("https://h.example/", '<a href="/x">' * 30_000)  # no closes
    assert time.monotonic() - t0 < 1.0
    t0 = time.monotonic()
    anchors_of("https://h.example/", '<a href="/x">t</a>' * 20_000)
    assert time.monotonic() - t0 < 1.0
    # many opens before ONE close: spans bounded by the raw window
    t0 = time.monotonic()
    anchors_of(
        "https://h.example/", '<a href="/x">pad ' * 20_000 + "</a>"
    )
    # O(opens * raw-window) by design — a constant-factor check, with
    # headroom for the sandbox VM's documented ~2x run-to-run noise
    assert time.monotonic() - t0 < 5.0


def test_anchors_on_synth_corpus(spark):
    """Corpus-scale anchor differential, mirroring the outlink one:
    every html page's (outlink, anchor) pairs agree with the
    html.parser collector on the raw html (value-level, 500 pages) —
    the pin that catches strip/close-semantics drift if webgen's page
    shapes ever change."""
    from ocr_application_spark.core.extraction_core import decode_html
    from ocr_application_spark.kernels.links import anchors_of, extract_anchors
    from ocr_application_spark.sources.webpages import synth_pages

    pages = synth_pages(spark, 500)
    got: dict = {}
    for r in extract_anchors(pages).collect():
        got.setdefault(r.url, set()).add((r.outlink, r.anchor))
    n_checked = 0
    for r in pages.select("url", "html").collect():
        if r.html is None:
            assert r.url not in got
            continue
        text = decode_html(bytes(r.html))
        want = _reference_anchors(r.url, text)
        assert got.get(r.url, set()) == want, r.url
        assert anchors_of(r.url, text) == want
        n_checked += 1
    assert n_checked >= 400
