"""Deterministic synthetic Common-Crawl-style page generator.

Produces rows of the BASELINE.json input_hint shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``
purely from a document id — no external data, no global RNG state (each
row seeds its own ``random.Random``), so generation is identical whether
run eagerly on the driver (oracle path) or distributed inside a
``mapInPandas`` over ``spark.range(n)`` (scale path: datagen itself is
embarrassingly parallel and shuffles nothing).

Page mix mirrors the reference's four routing classes
(classification_service/app/models/classifier.py:9-14 — "Bulltin soin",
"facture", "ordonnances", "autre") analogized for webtext:
article / invoice / form / other, plus ~5%% binary fake-PDF payloads
(layout branch) and ~4%% html-less rows (passthrough branch).

Host distribution is Zipf-skewed — a few hosts own a large share of rows —
to exercise salted repartitioning and AQE skew handling (north_rule).
"""

from __future__ import annotations

import datetime as dt
import json
import random

SEED0 = 0x5EED_CAFE

HOSTS = [f"host{i:03d}.example.{tld}" for i, tld in zip(range(60), ["com", "org", "net", "fr", "tn"] * 12)]

_WORDS_EN = (
    "the quick brown fox jumps over lazy dog data pipeline spark engine "
    "document extraction content analysis web crawl index token model "
    "system service quality metric value report health medical claim"
).split()
_WORDS_FR = (
    "le la les un une des santé médical document facture ordonnance soin "
    "montant total assuré prestation remboursement qualité valeur rapport "
    "système service données extraction contenu analyse modèle déclaration"
).split()
_WORDS_AR = "المريض الطبيب وصفة دواء فاتورة مبلغ تاريخ اسم عنوان تقرير صحة".split()

_FIELDS = ["NOM", "PRENOM", "DATE", "MONTANT", "ADRESSE", "REFERENCE", "CODE", "TOTAL"]

CLASSES = ("article", "invoice", "form", "other")


def _sentence(rng: random.Random, words: list[str], n: int) -> str:
    toks = [rng.choice(words) for _ in range(n)]
    # occasionally plant the reference's mojibake marker (F10 repair target)
    if rng.random() < 0.05:
        toks[rng.randrange(len(toks))] = "d??j??"
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str]) -> str:
    return " ".join(_sentence(rng, words, rng.randint(6, 14)) for _ in range(rng.randint(2, 5)))


def _link_block(rng: random.Random, words: list[str], n: int) -> str:
    return " ".join(
        f'<a href="/{rng.choice(words)}/{rng.randrange(999)}">{rng.choice(words)} {rng.choice(words)}</a>'
        for _ in range(n)
    )


def _boilerplate(rng: random.Random, words: list[str]) -> tuple[str, str]:
    head = (
        "<head><title>{t}</title></head>".format(t=" ".join(rng.choice(words) for _ in range(4)))
    )
    top = (
        f"<nav><ul>{''.join(f'<li>{_link_block(rng, words, 1)}</li>' for _ in range(6))}</ul></nav>"
        f"<header><h1>{rng.choice(words)} portal</h1>{_link_block(rng, words, 3)}</header>"
        f"<aside class='ads'>{_link_block(rng, words, rng.randint(5, 12))}"
        f"<p>{_sentence(rng, words, 5)}</p></aside>"
    )
    bottom = (
        f"<footer><p>copyright {rng.randrange(2010, 2024)} {rng.choice(words)}</p>"
        f"{_link_block(rng, words, 4)}</footer>"
    )
    return head, (top, bottom)


def _article_body(rng: random.Random, words: list[str]) -> str:
    paras = "".join(f"<p>{_paragraph(rng, words)}</p>" for _ in range(rng.randint(3, 8)))
    h = f"<h2>{_sentence(rng, words, 4)}</h2>"
    return f"<article>{h}{paras}</article>"


def _invoice_body(rng: random.Random, words: list[str]) -> str:
    rows = "".join(
        "<tr><td>{n}</td><td>{q}</td><td>{p:.2f}</td><td>{t:.2f}</td></tr>".format(
            n=rng.choice(words), q=rng.randint(1, 9), p=rng.uniform(1, 80), t=rng.uniform(1, 400)
        )
        for _ in range(rng.randint(4, 12))
    )
    hdr = "<tr><th>DESIGNATION</th><th>QTE</th><th>PRIX UNITAIRE</th><th>MONTANT</th></tr>"
    # randrange bounds are exclusive (months 1-11, days 1-27) — frozen as
    # part of the deterministic corpus spec; goldens depend on these draws
    total = f"<p>TOTAL: {rng.uniform(10, 900):.2f} DT</p><p>DATE: {rng.randrange(1, 28):02d}/{rng.randrange(1, 12):02d}/202{rng.randrange(0, 4)}</p>"
    return f"<section><h2>FACTURE N{rng.randrange(10000)}</h2><table>{hdr}{rows}</table>{total}</section>"


def _form_body(rng: random.Random, words: list[str]) -> str:
    fields = "".join(
        f"<form><p>{f}: <input name='{f.lower()}'/></p></form>" for f in rng.sample(_FIELDS, 5)
    )
    note = f"<div><p>{_paragraph(rng, words)}</p></div>"
    return f"<section><h2>{rng.choice(_FIELDS)} {rng.choice(words)}</h2>{fields}{note}</section>"


def _other_body(rng: random.Random, words: list[str]) -> str:
    # link-farm page: little real text, high link density
    blocks = "".join(
        f"<div>{_link_block(rng, words, rng.randint(4, 10))}<p>{_sentence(rng, words, 4)}</p></div>"
        for _ in range(rng.randint(2, 5))
    )
    return f"<section>{blocks}</section>"


_BODY_BUILDERS = {
    "article": _article_body,
    "invoice": _invoice_body,
    "form": _form_body,
    "other": _other_body,
}


def _pdf_payload(rng: random.Random, words: list[str]) -> bytes:
    """Fake-PDF span container (see extraction_core.parse_pdf_payload)."""
    page_width = 1000.0
    spans = []
    y = 40.0
    for _page in range(rng.randint(1, 3)):
        for _line in range(rng.randint(4, 12)):
            x = 30.0
            for _w in range(rng.randint(2, 7)):
                word = rng.choice(words)
                w = 16.0 + 7.0 * len(word)
                span = {
                    "page": _page,
                    "x0": round(x, 1),
                    "y0": round(y, 1),
                    "x1": round(x + w, 1),
                    "y1": round(y + rng.choice([12.0, 14.0, 16.0]), 1),
                    "conf": round(rng.uniform(0.3, 1.0), 3),
                    "text": word if rng.random() > 0.06 else rng.choice(_WORDS_AR),
                }
                spans.append(span)
                x += w + rng.uniform(5, 30)
            y += rng.choice([8.0, 20.0, 24.0, 40.0])  # some lines merge (<15), some split
        y += 60.0
    # a few degenerate boxes exercising the geometric filter (F5)
    for _ in range(rng.randint(0, 3)):
        spans.append(
            {"page": 0, "x0": 1.0, "y0": 1.0, "x1": rng.uniform(2, 12), "y1": 5.0,
             "conf": 0.99, "text": rng.choice(words)}
        )
    body = "\n".join(json.dumps(s, sort_keys=True) for s in spans)
    return f"%FPDF1 {page_width}\n{body}\n".encode("utf-8")


def _pick_host(rng: random.Random) -> str:
    """Zipf-ish: host rank ~ floor(pareto), heavily skewed to low ranks."""
    rank = min(int(rng.paretovariate(1.1)) - 1, len(HOSTS) - 1)
    return HOSTS[rank]


def gen_page(doc_id: int) -> dict:
    """One deterministic page row (input_hint schema) from its id."""
    rng = random.Random(SEED0 + doc_id * 1_000_003)
    host = _pick_host(rng)
    url = f"https://{host}/p/{doc_id:08d}"
    ts = dt.datetime(2023, 1, 1) + dt.timedelta(seconds=rng.randrange(365 * 24 * 3600))
    r = rng.random()
    lang = "fr" if rng.random() < 0.45 else ("ar" if rng.random() < 0.08 else "en")
    words = _WORDS_FR if lang == "fr" else (_WORDS_AR if lang == "ar" else _WORDS_EN)

    if r < 0.05:  # layout/PDF branch
        html: bytes | None = _pdf_payload(rng, _WORDS_FR if lang == "ar" else words)
        text = None
        klass = "invoice"
    elif r < 0.09:  # passthrough branch: html missing, pre-extracted text present
        html = None
        text = _paragraph(rng, words)
        klass = "article"
    else:
        klass = rng.choices(CLASSES, weights=[55, 15, 12, 18])[0]
        body = _BODY_BUILDERS[klass](rng, words)
        head, (top, bottom) = _boilerplate(rng, words)
        charset = "iso-8859-1" if (lang == "fr" and rng.random() < 0.10) else "utf-8"
        meta = f'<meta charset="{charset}"/>'
        doc = f"<html>{head.replace('<head>', '<head>' + meta)}<body>{top}{body}{bottom}</body></html>"
        try:
            html = doc.encode(charset)
        except UnicodeEncodeError:
            html = doc.encode("utf-8")
        text = None if rng.random() < 0.7 else _paragraph(rng, words)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
        "true_class": klass,  # held-out label for classifier tests (dropped from the input table)
    }


INPUT_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def gen_pages(start: int, count: int) -> list[dict]:
    return [gen_page(i) for i in range(start, start + count)]
