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


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
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
    """Driver-contract query: synth media -> decode -> features (rows-only)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return extract_features(build_media_table(docs)).orderBy("doc_id", "kind")
