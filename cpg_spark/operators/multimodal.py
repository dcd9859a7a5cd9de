"""Multimodal span handling: opaque binary payloads + typed metadata.

Media spans in the docs table carry ``media_ref`` pointers (blob store
URIs); a real pipeline joins them to a binary table
``media(media_ref string, payload binary, mime string)`` and runs decode /
feature-extraction in Arrow batches.  The image/audio codecs are not in
this container, so the decode kernel is STUBBED behind
``CPG_SPARK_FAKE_DECODE`` (deterministic fake) /
``NotImplementedError`` (real decode) — but everything Spark-side is real
and tested: schema, batching shape, partitioning, UDF signatures.

Mirrors how the reference treats non-code artifacts: passes them through
untouched while preserving span order (our input invariant)."""

from __future__ import annotations

import hashlib
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("mime", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("sha", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def media_refs(docs: DataFrame) -> DataFrame:
    """All media spans (doc_id, offset, media_ref) — pure Catalyst."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .filter(F.col("span.kind") == "media")
        .select("doc_id", F.col("span.offset").alias("offset"),
                F.col("span.media_ref").alias("media_ref"))
    )


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic fake blob store for tests: payload = blake2b stream
    keyed by media_ref (stands in for the real object-store join)."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                h = hashlib.blake2b(ref.encode(), digest_size=32).digest()
                rows.append({"media_ref": ref, "payload": h * 8,
                             "mime": "image/fake"})
            yield pd.DataFrame(rows, columns=["media_ref", "payload", "mime"])

    return (
        media_refs(docs).select("media_ref").distinct()
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode + feature-extract. Real codecs are not available in this
    container: gated behind an env flag with a deterministic fake whose
    Spark-side plumbing (batch shape, schema) is identical."""
    if os.environ.get("CPG_SPARK_FAKE_DECODE", "1") == "1":
        h = hashlib.blake2b(payload, digest_size=16).digest()
        width = 64 + h[0] % 64
        height = 64 + h[1] % 64
        feat = [((b / 255.0) - 0.5) for b in h]
        return width, height, feat
    raise NotImplementedError(
        "real image decode requires PIL/libvips — not present in this "
        "container; set CPG_SPARK_FAKE_DECODE=1 or ship codecs via --archives"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature pipeline over the binary column — the
    pattern for any multimodal kernel (resize, frame-sample, fingerprint)."""
    def run(batches):
        for pdf in batches:
            rows = []
            for ref, payload, mime in zip(pdf["media_ref"], pdf["payload"],
                                          pdf["mime"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, feat = _decode_image(payload)
                rows.append({
                    "media_ref": ref, "mime": mime, "n_bytes": len(payload),
                    "sha": hashlib.sha256(payload).hexdigest(),
                    "width": w, "height": h, "feature": feat,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.repartition(max(media.rdd.getNumPartitions(), 8)).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
