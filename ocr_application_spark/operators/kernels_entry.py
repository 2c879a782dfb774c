"""Kernel-stage queries for the driver contract.

``pipeline_extract_digest`` runs the REAL extraction engine (HTML wrap ->
mapInPandas Readability kernel -> sha256 digest) and is still fully
oracle-checked: because the docwrap templating is deterministic, DuckDB
can reconstruct the expected extracted text (title block + 25-word
paragraph chunks) and hash it with sha256 — a value-level cross-engine
check of the entire kernel path, not just a row count.

``multimodal_features`` exercises the binary-payload plumbing with a
deterministic stand-in decode, so it too is value-checked in SQL.
``classify_distribution`` stays rows-only: the model's argmax sits on
float log1p/softmax boundaries where a cross-engine ulp difference
could flip a class, so an "exact" SQL twin would be a flaky oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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


@_q(
    "pipeline_extract_digest",
    """
    with toks as (
      select doc_id, string_split(text, ' ') as t from documents
    ),
    chunks as (
      -- chunk boundaries over the RAW split list (empties included,
      -- exactly docwrap's words[i:i+25]); each chunk is then trimmed
      -- and whitespace-collapsed like the extractor's block normalize
      select doc_id, u.j,
             trim(regexp_replace(
               array_to_string(t[u.j*25+1 : least((u.j+1)*25, len(t))], ' '),
               '\\s+', ' ', 'g')) as c
      from toks, unnest(range(0, cast(ceil(len(t) / 25.0) as int))) u(j)
    ),
    rebuilt as (
      -- empty chunks vanish (docwrap emits no <p>); all-empty text falls
      -- back to the '<p>empty</p>' placeholder, as the wrapper does
      select doc_id,
             'document ' || cast(doc_id as varchar) || chr(10) ||
             coalesce(string_agg(c, chr(10) order by j) filter (where c <> ''),
                      'empty') as etext0
      from chunks group by doc_id
    ),
    final as (
      -- repair_mojibake: first replace consumes every '??' so the 'à'
      -- pass can never fire; then strip (trim)
      select doc_id, trim(replace(etext0, '??', 'é')) as etext from rebuilt
    )
    select 'https://docs.example/' || printf('%08d', doc_id) as url,
           length(etext) as n_chars,
           sha256(etext) as digest
    from final
    """,
)
def pipeline_extract_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kernel path, value-checked end-to-end: documents ->
    deterministic HTML wrap -> Arrow-batched extraction kernel ->
    (url, n_chars, sha256 digest). The oracle rebuilds the expected
    main-content text in SQL and must hash identically — the DuckDB
    twin of the pytest byte-identity gate."""
    from ocr_application_spark.datagen.docwrap import documents_as_pages
    from ocr_application_spark.kernels.extract import extract

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = extract(documents_as_pages(docs))
    return out.select("url", "n_chars", "digest")


@_q("classify_distribution")
def classify_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-routing counts from the broadcast-weights classifier
    (K1 analog) — rows-only (model semantics live in the kernel).

    Input is the driver's documents table (uniform article-like prose,
    which the model routes to one class) unioned with the deterministic
    synthetic corpus whose invoice/form/link-farm page mix exercises all
    four routes — so this query actually checks the 4-way routing, not a
    single degenerate bucket."""
    from ocr_application_spark.datagen.docwrap import documents_as_pages
    from ocr_application_spark.pipeline import extract_pages
    from ocr_application_spark.sources.webpages import synth_pages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = documents_as_pages(docs).unionByName(synth_pages(spark, 2000))
    out = extract_pages(pages)
    return (
        out.groupBy("doc_class")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("confidence"), 4).alias("avg_conf"),
        )
        .orderBy("doc_class")
    )



@_q(
    "multimodal_features",
    """
    select doc_id,
           cast(octet_length(encode(text)) as int) as n_bytes,
           cast(octet_length(encode(text)) % 640 as int) as width,
           cast(octet_length(encode(text)) % 480 as int) as height,
           substr(sha256(text), 1, 16) as checksum
    from documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat document bytes as an opaque binary
    payload column and run a feature-extraction kernel over mapInPandas
    (batch shape, schema, partitioning are real; the decode itself is a
    deterministic stand-in since no image libs ship in this container —
    marked STUB). Because the stand-in is deterministic (sha256 +
    size-derived dims), the whole binary-payload path is value-checked:
    DuckDB's sha256(varchar) hashes the same utf-8 bytes the kernel
    receives from encode(text)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"), F.lit("text/plain").alias("mime")
    )

    schema = "doc_id long, n_bytes int, width int, height int, checksum string"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payload = pdf["payload"]
            # STUB decode: deterministic fake dimensions derived from size;
            # a real deployment drops in PIL/cv2 decode here — the Spark
            # plumbing (Arrow batches, schema, partitioning) is unchanged.
            n = payload.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": (n % 640).astype("int32"),
                    "height": (n % 480).astype("int32"),
                    "checksum": [hashlib.sha256(b).hexdigest()[:16] for b in payload],
                }
            )

    return payloads.mapInPandas(feats, schema=schema)


@_q(
    "multimodal_resize",
    """
    select doc_id,
           octet_length(encode(text)) as in_bytes,
           octet_length(encode(substring(text, 1, cast(ceil(length(text) / 2.0) as int)))) as out_bytes,
           substr(sha256(substring(text, 1, cast(ceil(length(text) / 2.0) as int))), 1, 16) as out_checksum
    from documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/transcode plumbing: binary payload in, transformed payload
    out, 1:1 (the third multimodal kernel shape, after scalar-out
    feature extraction and explode-out frame sampling). The transform is
    a STUB crop-to-half (a real deployment drops in PIL resize /
    ffmpeg transcode); being deterministic, the output payload is
    value-checked end-to-end via its sha256. The kernel returns the new
    payload as binary — downstream stages keep operating on the column —
    while the oracle checks its length + digest."""
    import hashlib
    import math

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    schema = "doc_id long, in_bytes int, out_bytes int, out_checksum string"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf["payload"]:
                text = payload.decode("utf-8")  # STUB decode
                outs.append(text[: math.ceil(len(text) / 2)].encode("utf-8"))  # STUB resize
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_bytes": pdf["payload"].map(len),
                    "out_bytes": [len(o) for o in outs],
                    "out_checksum": [hashlib.sha256(o).hexdigest()[:16] for o in outs],
                }
            )

    return payloads.mapInPandas(resize, schema=schema)


@_q(
    "multimodal_frame_sample",
    """
    select doc_id,
           u.i as frame_no,
           length(substring(text, u.i * 600 + 1, 200)) as frame_chars,
           substr(sha256(substring(text, u.i * 600 + 1, 200)), 1, 16) as frame_checksum
    from documents,
         unnest(range(0, cast(ceil(length(text) / 600.0) as int))) u(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload column: one binary in, many
    frame rows out (the explode-shaped multimodal kernel — video frame
    extraction / audio windowing have exactly this Spark plumbing).

    The kernel decodes the payload (STUB: utf-8 text stand-in for a real
    container demuxer) and samples the leading 200 chars of each
    600-char stride. Deterministic -> exact DuckDB oracle, including the
    per-frame sha256. Scale: narrow mapInPandas, output fans out ~len/600
    rows per doc with no shuffle; frame rows inherit the input's
    partitioning for downstream per-frame batch inference."""
    import hashlib
    import math

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = d.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    schema = "doc_id long, frame_no long, frame_chars int, frame_checksum string"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, nos = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = payload.decode("utf-8")  # STUB decode (see above)
                for i in range(math.ceil(len(text) / 600)):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(text[i * 600 : i * 600 + 200])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": nos,
                    "frame_chars": [len(f) for f in frames],
                    "frame_checksum": [
                        hashlib.sha256(f.encode("utf-8")).hexdigest()[:16] for f in frames
                    ],
                }
            )

    return payloads.mapInPandas(sample, schema=schema)
