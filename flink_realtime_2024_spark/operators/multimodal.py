"""Multimodal columns (SURVEY §2.10 L6): opaque binary payloads + typed
metadata, processed by Arrow-batched kernels.

Pattern for image/audio/video at 100 TB: the payload is a BinaryType
column (never parsed by Catalyst), a typed metadata struct rides along
for pruning/partitioning, and decode / feature-extract / resize /
frame-sample run as mapInPandas kernels (one Arrow batch of payloads at
a time — bounded executor memory, no driver involvement).

The decode step itself is a STUB: real codecs (PIL/librosa/ffmpeg) are
not in this container. ``fake_decode_stats`` is a deterministic
stand-in with the same signature/batching a real decoder would have;
``decode_image`` raises NotImplementedError to mark the integration
point. The Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.io import load_table
from ..plans.registry import register


def decode_image(payload: bytes) -> "object":
    """Real decoder integration point (PIL.Image.open-equivalent)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "swap in PIL/torchvision/librosa here on a real cluster"
    )


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def fake_decode_stats(batches):
    """Deterministic decoder stand-in: derives 'dimensions' from the
    payload hash. Signature and batch shape match a real decoder kernel:
    iterator of pandas batches in, iterator of pandas batches out."""
    for pdf in batches:
        digests = [hashlib.md5(p).digest() for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"].to_numpy(),
                "mime": pdf["mime"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [16 + d[0] % 240 for d in digests],
                "height": [16 + d[1] % 240 for d in digests],
                "checksum": [d.hex() for d in digests],
            }
        )


@register("mm_decode_stats", oracle=None, section="L6")
def mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 multimodal pipeline: synthesize a binary asset table from
    documents (payload = utf-8 bytes standing in for encoded media),
    run the decode kernel via mapInPandas, aggregate per mime type.
    Rows-only (binary kernels aren't SQL-expressible)."""
    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )
    decoded = assets.mapInPandas(fake_decode_stats, DECODE_STATS_SCHEMA)
    return decoded.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )
