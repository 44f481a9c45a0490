"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched UDFs.

This container ships no image/audio codecs, so the DECODE step is a
deterministic fake format ("SKGM"): a self-describing byte layout that the
decode UDF really parses (magic, kind, dims, payload). The Spark-side
contract — schema, partitioning, UDF signatures, batch shape — is real and
tested; swapping ``_decode_payload`` for PIL/torchaudio is a one-function
change (a real codec import raises NotImplementedError here by design).

Layout: b"SKGM" | kind:1 (0=image,1=audio) | w:2 | h:2 | body bytes
(image body = w*h pseudo-pixels; audio body = w samples, h = sample rate/100).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAGIC = b"SKGM"

MEDIA_SCHEMA = ("doc_id long, kind string, payload binary, "
                "meta struct<width:int,height:int,sample_rate:int>")


def _fake_payload(doc_id: int, kind: str) -> bytes:
    h = hashlib.md5(f"{kind}:{doc_id}".encode()).digest()
    w = 8 + h[0] % 24
    hgt = 8 + h[1] % 24 if kind == "image" else 160
    body_len = w * hgt if kind == "image" else w
    body = (h * (body_len // len(h) + 1))[:body_len]
    kind_b = 0 if kind == "image" else 1
    return MAGIC + struct.pack(">BHH", kind_b, w, hgt) + body


def build_media_table(documents: DataFrame) -> DataFrame:
    """documents -> synthetic media rows (one image + one audio per doc),
    synthesized executor-side."""
    src = documents.select("doc_id")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                for kind in ("image", "audio"):
                    payload = _fake_payload(int(doc_id), kind)
                    _, w, hgt = struct.unpack(">BHH", payload[4:9])
                    rows.append({
                        "doc_id": int(doc_id), "kind": kind, "payload": payload,
                        "meta": {"width": w, "height": hgt,
                                 "sample_rate": hgt * 100 if kind == "audio" else 0},
                    })
            if rows:
                yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes):
    """The stubbed decode: parses the fake container. For real media bytes
    (wrong magic) this is where PIL/libsndfile would plug in."""
    if payload[:4] != MAGIC:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "payload is not in the SKGM fake container format")
    kind_b, w, h = struct.unpack(">BHH", payload[4:9])
    body = np.frombuffer(payload[9:], dtype=np.uint8)
    return ("image" if kind_b == 0 else "audio"), w, h, body


FEATURES_SCHEMA = ("doc_id long, kind string, width int, height int, "
                   "n_bytes int, mean_val double, histogram array<int>")


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """decode + featurize in one Arrow pass: byte-histogram + mean as the
    stand-in feature extractor (numpy-vectorized per batch)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                kind, w, h, body = _decode_payload(bytes(payload))
                hist = np.bincount(body // (256 // bins), minlength=bins)
                rows.append((int(doc_id), kind, w, h, len(body),
                             float(body.mean()), hist.tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "doc_id", "kind", "width", "height", "n_bytes",
                    "mean_val", "histogram"])

    return media.select("doc_id", "payload").mapInPandas(gen, FEATURES_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(media: DataFrame, target: int = 8) -> DataFrame:
    """'Resize' images to target x target by strided sampling of the fake
    pixel grid (the plumbing for a real resize kernel)."""
    src = media.filter(F.col("kind") == "image").select("doc_id", "payload")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, w, h, body = _decode_payload(bytes(payload))
                grid = body[:w * h].reshape(h, w)
                ys = np.linspace(0, h - 1, target).astype(int)
                xs = np.linspace(0, w - 1, target).astype(int)
                small = grid[np.ix_(ys, xs)]
                out = MAGIC + struct.pack(">BHH", 0, target, target) + small.tobytes()
                rows.append((int(doc_id), target, target, out))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return src.mapInPandas(gen, RESIZED_SCHEMA)


# default shared with the DuckDB mirror below (oracle parity holds exactly
# for default arguments)
FRAME_EVERY = 4


def sample_frames(media: DataFrame, every: int = FRAME_EVERY) -> DataFrame:
    """Audio frame sampling: every Nth sample (video-frame-sampling shape)."""
    src = media.filter(F.col("kind") == "audio").select("doc_id", "payload")

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, w, h, body = _decode_payload(bytes(payload))
                rows.append((int(doc_id), body[::every].astype(int).tolist()))
            if rows:
                yield pd.DataFrame(rows, columns=["doc_id", "samples"])

    return src.mapInPandas(gen, "doc_id long, samples array<int>")


def q_media_features(spark, sf_dir):
    """Driver-contract query: synth media -> decode -> features.

    Scalar-only output (the duel harness canonicalizes by sorting/hashing
    column values, so array columns are flattened: histogram -> csv string,
    mean -> round(4)). Every column is oracle-checked: the fake container is
    md5-derived, so DuckDB can reproduce width/height/n_bytes/mean/histogram
    from doc_id with the same instr-based hex-digit math as the SimHash duel.
    """
    from scikg_spark.pipeline.session import parallelize_scan

    # decode/feature UDFs are compute-bound: track cores, not splits
    docs = parallelize_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))
    feats = extract_features(build_media_table(docs))
    return feats.select(
        "doc_id", "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round("mean_val", 4).alias("mean_r"),
        F.expr("array_join(transform(histogram, x -> cast(x as string)), ',')")
        .alias("hist_csv"),
    ).orderBy("doc_id", "kind")


# DuckDB mirror of _fake_payload + extract_features: md5(kind:doc_id) digest
# bytes -> dims -> body bytes (digest repeated cyclically) -> mean + 16-bin
# byte histogram. body_len <= 31*31, so the per-row series stays tiny.
# Digest byte j comes from hex digits 2j+1 / 2j+2 of the md5 string via the
# same instr math as dedup._simhash_bit_expr.
ORACLE = {
    "q_media_features": """
        WITH media AS (
            SELECT doc_id, kind, md5(kind || ':' || doc_id) AS hx
            FROM documents
            CROSS JOIN (SELECT unnest(['image', 'audio']) AS kind)
        ),
        bytes AS (
            SELECT doc_id, kind, j.i AS j,
                   (instr('0123456789abcdef', substring(hx, 2 * j.i + 1, 1)) - 1) * 16
                   + (instr('0123456789abcdef', substring(hx, 2 * j.i + 2, 1)) - 1)
                       AS b
            FROM media CROSS JOIN generate_series(0, 15) AS j(i)
        ),
        dims AS (
            SELECT m.doc_id, m.kind,
                   8 + b0.b % 24 AS width,
                   CASE WHEN m.kind = 'image' THEN 8 + b1.b % 24
                        ELSE 160 END AS height
            FROM media m
            JOIN bytes b0 ON b0.doc_id = m.doc_id AND b0.kind = m.kind AND b0.j = 0
            JOIN bytes b1 ON b1.doc_id = m.doc_id AND b1.kind = m.kind AND b1.j = 1
        ),
        sized AS (
            SELECT *, CASE WHEN kind = 'image' THEN width * height
                           ELSE width END AS n_bytes
            FROM dims
        ),
        body AS (
            SELECT s.doc_id, s.kind, s.width, s.height, s.n_bytes, by.b AS byte
            FROM sized s
            CROSS JOIN generate_series(0, 31 * 31 - 1) AS g(i)
            JOIN bytes by ON by.doc_id = s.doc_id AND by.kind = s.kind
                         AND by.j = g.i % 16
            WHERE g.i < s.n_bytes
        ),
        stats AS (
            SELECT doc_id, kind, width, height, n_bytes,
                   round(sum(byte) * 1.0 / n_bytes, 4) AS mean_r
            FROM body GROUP BY 1, 2, 3, 4, 5
        ),
        hist_counts AS (
            SELECT doc_id, kind, byte // 16 AS bin, count(*) AS cnt
            FROM body GROUP BY 1, 2, 3
        ),
        hist AS (
            SELECT d.doc_id, d.kind,
                   string_agg(CAST(coalesce(hc.cnt, 0) AS VARCHAR), ','
                              ORDER BY bn.bin) AS hist_csv
            FROM dims d
            CROSS JOIN generate_series(0, 15) AS bn(bin)
            LEFT JOIN hist_counts hc
                   ON hc.doc_id = d.doc_id AND hc.kind = d.kind
                  AND hc.bin = bn.bin
            GROUP BY 1, 2
        )
        SELECT s.doc_id AS doc_id, s.kind AS kind,
               CAST(s.width AS BIGINT) AS width,
               CAST(s.height AS BIGINT) AS height,
               CAST(s.n_bytes AS BIGINT) AS n_bytes,
               s.mean_r, h.hist_csv
        FROM stats s
        JOIN hist h ON h.doc_id = s.doc_id AND h.kind = s.kind
    """,
}


def q_frame_sample_stats(spark, sf_dir, every: int = FRAME_EVERY):
    """Driver-contract query #2: synth media -> audio frame sampling (the
    video-frame-sampling shape) -> per-doc stats over the sampled frames.
    Fully oracle-checked — the sampled positions are deterministic functions
    of the md5-derived fake container."""
    from scikg_spark.pipeline.session import parallelize_scan

    # decode/feature UDFs are compute-bound: track cores, not splits
    docs = parallelize_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))
    frames = sample_frames(build_media_table(docs), every=every)
    n = F.size("samples")
    total = F.expr("aggregate(samples, cast(0.0 as double), (a, x) -> a + x)")
    return frames.select(
        "doc_id",
        n.cast("long").alias("n_samples"),
        F.round(total / n.cast("double"), 4).alias("mean_r"),
    ).orderBy("doc_id")


# audio body byte g.i is digest byte (g.i % 16) of md5('audio:' || doc_id);
# sampling keeps positions g.i % every == 0 below width = 8 + digest[0] % 24
ORACLE["q_frame_sample_stats"] = f"""
    WITH media AS (
        SELECT doc_id, md5('audio:' || doc_id) AS hx FROM documents
    ),
    bytes AS (
        SELECT doc_id, j.i AS j,
               (instr('0123456789abcdef', substring(hx, 2 * j.i + 1, 1)) - 1) * 16
               + (instr('0123456789abcdef', substring(hx, 2 * j.i + 2, 1)) - 1)
                   AS b
        FROM media CROSS JOIN generate_series(0, 15) AS j(i)
    ),
    dims AS (
        SELECT m.doc_id, 8 + b0.b % 24 AS width
        FROM media m JOIN bytes b0 ON b0.doc_id = m.doc_id AND b0.j = 0
    ),
    samp AS (
        SELECT d.doc_id, by.b AS byte
        FROM dims d
        CROSS JOIN generate_series(0, 31) AS g(i)
        JOIN bytes by ON by.doc_id = d.doc_id AND by.j = g.i % 16
        WHERE g.i < d.width AND g.i % {FRAME_EVERY} = 0
    )
    SELECT doc_id, count(*) AS n_samples, round(avg(byte), 4) AS mean_r
    FROM samp GROUP BY doc_id ORDER BY doc_id
"""
