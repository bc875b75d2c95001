"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's event body is exactly this pattern — opaque BYTEA plus a
string-typed metadata map parsed on demand (``internal/model/model.go:26-58``);
here it is generalized to image/audio/video assets. The Spark-side
plumbing (schema, partitioning, Arrow batch shape through mapInPandas)
is real and tested; the actual codec step is stubbed: the container has
no image/audio libraries, so ``decode`` either raises
``NotImplementedError`` (real mode) or produces a deterministic fake
feature vector derived from the bytes (fake mode, used by tests/queries).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),    # image | audio | video
    T.StructField("content", T.BinaryType(), True),      # opaque payload
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_DIM = 8


def synth_assets(docs: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake asset table derived from documents: payload =
    utf-8 bytes of the text, modality round-robins by id. Stands in for
    `spark.read.format('binaryFile')` at test scale."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.create_map(
            F.lit("content-type"), F.concat(modality, F.lit("/raw")),
            F.lit("n_bytes"), F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("string"),
        ).alias("meta"),
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: per-asset digest + size (no decode)."""
    return assets.select(
        "asset_id",
        "modality",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("sha256"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: dim floats in
    [0, 1) derived from the sha256 of the payload."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i:4 * i + 4], "big") / 2**32
        for i in range(dim)
    ]


def decode_and_featurize(assets: DataFrame, *, fake: bool = True,
                         batch_note_col: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract pass — the real plumbing for a
    codec UDF: Arrow-batched binary in, fixed-width feature vector out.

    With ``fake=False`` this raises NotImplementedError at execution
    time (no codec libraries in this container) — the call site,
    schema, batch shape and partitioning are exactly what a real
    decoder drops into.
    """
    out_schema = T.StructType([
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ] + ([T.StructField("rows_in_batch", T.IntegerType(), False)] if batch_note_col else []))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode requires image/audio codecs not present in this "
                    "container; run with fake=True for the deterministic stand-in"
                )
            out = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "features": [_fake_features(p) for p in pdf["content"]],
            }
            if batch_note_col:
                out["rows_in_batch"] = [len(pdf)] * len(pdf)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "modality", "content").mapInPandas(run, out_schema)


def frame_sample(assets: DataFrame, *, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the fake payloads: one row per sampled offset
    (video-frame extraction plumbing — explode over a computed offset
    sequence, JVM-side; the per-frame decode would plug into
    decode_and_featurize)."""
    n = F.octet_length("content")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return (
        assets.where(F.col("modality") == "video")
        .select("asset_id", F.posexplode(offsets).alias("frame_no", "byte_offset"))
    )
