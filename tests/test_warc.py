"""WET/WARC segment source (sources/warc.py): byte-framing round-trip
on adversarial payloads, malformed-input quarantine semantics, packing
determinism. The gate query's oracle parity runs in test_oracle_parity.
"""

import pandas as pd
import pytest

from ocr_application_spark.sources.warc import (
    pack_wet_segments,
    parse_wet_bytes,
    parse_wet_segments,
)

ADVERSARIAL_TEXTS = [
    "plain words",
    "",  # empty payload: Content-Length 0
    "embedded\r\n\r\nrecord separator",
    "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake inner record\r\n\r\n",
    "unicode — naïve café 世界 🚀",
    "Content-Length: 999999",
    "trailing newlines\r\n\r\n\r\n",
    " \t leading ws",
    "a" * 10_000,
]


def _pages(spark, texts):
    rows = [
        (f"https://t.example/{i:04d}", f"2024-01-01T00:00:{i % 60:02d}Z", t)
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "warc_date", "text"]))


def test_roundtrip_identity_on_adversarial_payloads(spark):
    pages = _pages(spark, ADVERSARIAL_TEXTS)
    parsed = parse_wet_segments(pack_wet_segments(pages, n_segments=3))
    got = {r["url"]: r for r in parsed.collect()}
    assert len(got) == len(ADVERSARIAL_TEXTS)
    for i, t in enumerate(ADVERSARIAL_TEXTS):
        r = got[f"https://t.example/{i:04d}"]
        assert r["status"] == "ok"
        assert r["text"] == t
        assert r["n_bytes"] == len(t.encode("utf-8"))
        assert r["warc_date"] == f"2024-01-01T00:00:{i % 60:02d}Z"


def test_packing_is_deterministic(spark):
    pages = _pages(spark, ADVERSARIAL_TEXTS)
    a = {r["seg"]: bytes(r["payload"]) for r in pack_wet_segments(pages, 3).collect()}
    b = {r["seg"]: bytes(r["payload"]) for r in pack_wet_segments(pages, 3).collect()}
    assert a == b
    assert sum(len(v) for v in a.values()) > 0


def _record(url: str, body: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "
        + url.encode()
        + b"\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )


def test_truncated_segment_quarantines_remainder_keeps_prefix():
    blob = _record("https://a", b"first ok") + _record("https://b", b"second")[:-6]
    out = parse_wet_bytes(blob)
    assert [r["status"] for r in out][0] == "ok"
    assert out[0]["text"] == "first ok"
    assert len(out) == 2 and out[1]["status"].startswith("malformed:framing")


def test_invalid_utf8_payload_quarantines_record_parsing_continues():
    blob = _record("https://a", b"\xff\xfe broken") + _record("https://b", b"fine")
    out = parse_wet_bytes(blob)
    assert out[0]["status"].startswith("malformed:payload-encoding")
    assert out[1] == {
        "url": "https://b",
        "warc_date": "2024-01-01T00:00:00Z",
        "text": "fine",
        "n_bytes": 4,
        "status": "ok",
    }


def test_bad_version_and_header_shapes():
    assert parse_wet_bytes(b"HTTP/1.1 200 OK\r\n\r\n")[0]["status"].startswith(
        "malformed:version"
    )
    assert parse_wet_bytes(b"WARC/1.0\r\nno colon line\r\n\r\nx\r\n\r\n")[0][
        "status"
    ].startswith("malformed:header-line")
    no_len = b"WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nx\r\n\r\n"
    assert parse_wet_bytes(no_len)[0]["status"].startswith("malformed:content-length")
    assert parse_wet_bytes(b"WARC/1.0\r\nWARC-Type: conversion")[0]["status"].startswith(
        "malformed:unterminated-header"
    )


def test_content_length_frames_through_lookalike_bodies():
    """A body that BEGINS with a valid-looking record must not desync
    the parser: framing is length-based, never marker-based."""
    inner = _record("https://inner", b"decoy")
    blob = _record("https://outer", inner) + _record("https://after", b"tail")
    out = parse_wet_bytes(blob)
    assert [r["url"] for r in out] == ["https://outer", "https://after"]
    assert out[0]["text"] == inner.decode("utf-8")


def test_empty_segment_and_empty_roundtrip(spark):
    assert parse_wet_bytes(b"") == []
    pages = spark.createDataFrame([], "url string, warc_date string, text string")
    assert parse_wet_segments(pack_wet_segments(pages, 2)).count() == 0


def test_pack_rejects_bad_segment_count(spark):
    with pytest.raises(ValueError):
        pack_wet_segments(_pages(spark, ["x"]), 0)


def test_wet_stream_matches_batch(spark, tmpdir_scratch):
    """Stream-parsed WET segments == batch-parsed, value level; a
    malformed segment lands in quarantine, not in the output."""
    from ocr_application_spark.streaming.stream import run_wet_stream_to_table

    pages = _pages(spark, ADVERSARIAL_TEXTS)
    segs = pack_wet_segments(pages, n_segments=4)
    inp = tmpdir_scratch + "/segs"
    # repartition: several files so the stream sees multiple batches
    segs.repartition(4).write.parquet(inp)
    # plus one poisoned segment file: truncated framing
    poisoned = spark.createDataFrame(
        [(999, bytearray(b"WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 5\r\n\r\nab"), 1)],
        "seg bigint, payload binary, n_records int",
    )
    poisoned.write.mode("append").parquet(inp)

    q = run_wet_stream_to_table(
        spark, inp, tmpdir_scratch + "/out", tmpdir_scratch + "/ckpt"
    )
    assert q.awaitTermination(120)

    got = spark.read.parquet(tmpdir_scratch + "/out")
    batch = parse_wet_segments(segs).where("status = 'ok'")
    assert got.count() == batch.count()
    a = {(r.url, r.text, r.warc_date) for r in got.collect()}
    b = {(r.url, r.text, r.warc_date) for r in batch.collect()}
    assert a == b
    quar = spark.read.parquet(tmpdir_scratch + "/out_quarantine")
    assert quar.count() == 1
    assert quar.collect()[0]["status"].startswith("malformed:framing")


def test_curate_job_wet_input_mode(spark, tmpdir_scratch):
    """The funnel consumes a WET drop folder end-to-end: stage (one
    parse pass -> documents shape + quarantine), then gate chain."""
    from jobs.curate_job import curate, stage_wet_input

    # stopword/unique-token interleave: enough stopwords for the clean
    # gate's language signal, every n-gram distinct so the Gopher
    # repetition gate (which rightly kills copy-pasted filler) passes
    stops = ("the", "of", "and", "a", "to")
    texts = [
        " ".join(
            t for j in range(20) for t in (stops[j % 5], f"unique{i}word{j}")
        )
        for i in range(40)
    ]
    pages = _pages(spark, texts)
    inp = tmpdir_scratch + "/segs"
    pack_wet_segments(pages, n_segments=4).write.parquet(inp)
    spark.createDataFrame(
        [(999, bytearray(b"garbage not warc"), 1)],
        "seg bigint, payload binary, n_records int",
    ).write.mode("append").parquet(inp)

    staged = tmpdir_scratch + "/staged"
    m = stage_wet_input(spark, inp, staged)
    assert m["records"] == 41 and m["rows_out"] == 40 and m["malformed"] == 1
    assert spark.read.parquet(staged + "/quarantine.parquet").count() == 1

    docs = spark.read.parquet(staged + "/documents.parquet")
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert docs.where("source = 't.example'").count() == 40
    assert docs.select("doc_id").distinct().count() == 40

    curated, metrics = curate(spark, staged, gates=("clean", "repetition"))
    assert metrics[0]["rows_in"] == 40
    assert curated.count() > 0
    assert set(curated.columns) >= {"doc_id", "text", "split", "shard"}
