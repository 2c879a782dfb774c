"""Charset sniffing edge cases: BOM precedence, quote styles, the
bounded head scan, and all three BOM families."""

import pytest

from ocr_application_spark.operators.charset_sniff import sniff_charset

BOM8 = b"\xef\xbb\xbf"
BOM16LE = b"\xff\xfe"
BOM16BE = b"\xfe\xff"


def _sniff(spark, payloads: list[bytes]):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], "i int, html binary"
    )
    rows = sniff_charset(df, "html").orderBy("i").collect()
    return [(r.charset, r.src) for r in rows]


def test_bom_wins_over_meta(spark):
    got = _sniff(
        spark,
        [
            BOM8 + b'<meta charset="iso-8859-1">hello',
            BOM16LE + b"anything",
            BOM16BE + b"anything",
        ],
    )
    assert got == [("utf-8", "bom"), ("utf-16le", "bom"), ("utf-16be", "bom")]


def test_meta_quote_styles_and_case(spark):
    got = _sniff(
        spark,
        [
            b'<head><meta charset="windows-1252"></head>x',
            b"<head><meta charset='KOI8-R'></head>x",
            b"<head><META CHARSET=shift_jis></head>x",
        ],
    )
    assert got == [
        ("windows-1252", "meta"),
        ("koi8-r", "meta"),
        ("shift_jis", "meta"),
    ]


def test_head_scan_is_bounded_to_1kib(spark):
    # a meta declaration past the 1 KiB scan window is ignored (WHATWG
    # sniffers stop early; an adversarial page can't make the detector
    # read the whole payload)
    late = b" " * 1024 + b'<meta charset="iso-8859-1">'
    early = b" " * 990 + b'<meta charset="iso-8859-1">'
    got = _sniff(spark, [late, early])
    assert got[0] == ("utf-8", "default")
    assert got[1] == ("iso-8859-1", "meta")


def test_no_signal_defaults_utf8(spark):
    got = _sniff(spark, [b"plain ascii body with no declaration"])
    assert got == [("utf-8", "default")]


def test_unquoted_value_whatwg_stop_bytes(spark):
    # WHATWG unquoted attribute values end at whitespace / ';' / '/'
    # (self-closing tag) / '>' — none of these bytes belong to the token
    got = _sniff(
        spark,
        [
            b"<meta charset=utf-8/>",
            b"<meta charset=utf-8\n><body>x</body>",
            b"<meta charset=utf-8\t>",
            b"<meta charset=utf-8;x>",
            b"<meta charset=utf-8\r\n>",
        ],
    )
    assert got == [("utf-8", "meta")] * 5


def test_nibble_misaligned_pattern_is_not_a_match(spark):
    # bytes whose HEX SPELLING contains 'charset=utf-8 ' starting at an
    # ODD nibble offset (spanning byte boundaries): a binary payload
    # must sniff as default, not as a garbage 'meta' detection
    pat_hex = b"charset=utf-8 ".hex().upper()
    payload = bytes.fromhex("0" + pat_hex + "0")
    assert b"charset=" not in payload  # the real bytes never say it
    got = _sniff(spark, [payload])
    assert got == [("utf-8", "default")]


def test_differential_vs_python_twin_on_random_payloads(spark):
    """Differential pin: Java regex over Spark columns vs Python ``re``
    over the SAME hex strings and shared pattern, across payloads mixing
    random bytes, planted metas (all quote styles/terminators/cases),
    BOMs, and nibble-adversarial noise. Any engine-semantics drift in
    the shared pattern surfaces here before it can ship."""
    import random
    import re as _re

    from ocr_application_spark.operators.charset_sniff import (
        _META_GROUP,
        _META_PAT,
        _SCAN_BYTES,
    )

    def twin(payload: bytes) -> tuple:
        hexs = payload[:_SCAN_BYTES].hex().upper()
        for bom, cs in (("EFBBBF", "utf-8"), ("FFFE", "utf-16le"), ("FEFF", "utf-16be")):
            if hexs.startswith(bom):
                return cs, "bom"
        m = _re.search(_META_PAT, hexs)
        if m and m.group(_META_GROUP):
            return bytes.fromhex(m.group(_META_GROUP)).decode("utf-8").lower(), "meta"
        return "utf-8", "default"

    rng = random.Random(20260819)
    charsets = ["utf-8", "ISO-8859-1", "Windows-1252", "shift_jis", "KOI8-R"]
    payloads = []
    for i in range(200):
        kind = i % 5
        cs = rng.choice(charsets)
        quote, term = rng.choice(['"', "'", ""]), rng.choice([">", "/>", " >", ";>", "\n>"])
        meta = f"<meta charset={quote}{cs}{quote or term[0] if quote else ''}{term}".encode()
        filler = bytes(rng.randrange(32, 127) for _ in range(rng.randrange(0, 200)))
        if kind == 0:
            payloads.append(rng.choice([b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff"]) + filler + meta)
        elif kind == 1:
            payloads.append(filler + meta + filler)
        elif kind == 2:
            payloads.append(bytes(rng.randrange(0, 256) for _ in range(rng.randrange(1, 300))))
        elif kind == 3:  # nibble-adversarial: pattern hex at odd offset
            payloads.append(bytes.fromhex("0" + f"charset={cs} ".encode().hex().upper() + "0"))
        else:
            payloads.append(filler)
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)], "i int, html binary"
    )
    got = {
        r.i: (r.charset, r.src)
        for r in sniff_charset(df, "html").select("i", "charset", "src").collect()
    }
    for i, p in enumerate(payloads):
        want = twin(p)
        # Spark lowercases via lower(); the twin too — compare directly
        assert got[i] == want, (i, p[:60], got[i], want)
