"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas`` so each executor processes whole
record batches (the only sane shape for media at 100 TB: bytes never
touch the driver, partition = unit of decode parallelism).

The decode kernels themselves are STUBBED in this environment (no
image/audio libraries in the container): ``decode_image`` raises
NotImplementedError by design, and ``fake_feature_extract`` is the
deterministic stand-in used by tests — it exercises the real Spark
plumbing (schema, batching, partitioning) with a hash-derived
feature vector instead of pixels.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


try:  # optional dependency — decode lights up when Pillow exists
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no Pillow
    _PILImage = None


def decode_image(payload: bytes) -> "np.ndarray":
    """payload bytes -> HxWxC uint8 array via Pillow when available;
    the declared stub otherwise (this container ships no imaging
    libs — the Spark-side plumbing stays real either way)."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decoding requires Pillow, not present in this "
            "container; `pip install Pillow` lights this up"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def decode_image_batch(df: DataFrame, resize: tuple[int, int] | None = None) -> DataFrame:
    """(media_id, height, width, channels, pixels array<int>) — real
    decode (+optional resize) of image rows as an Arrow-batched
    mapInPandas stage. Requires Pillow; raises ImportError up front
    (not per-task) when absent so a misconfigured cluster fails fast
    on the driver, not 10k times on executors."""
    if _PILImage is None:
        raise ImportError("decode_image_batch requires Pillow")

    out_schema = (
        "media_id long, height int, width int, channels int, pixels array<int>"
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = {"media_id": [], "height": [], "width": [],
                    "channels": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with _PILImage.open(io.BytesIO(bytes(payload))) as im:
                    if resize is not None:
                        im = im.resize(resize)
                    arr = np.asarray(im.convert("RGB"))
                rows["media_id"].append(mid)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["channels"].append(arr.shape[2])
                rows["pixels"].append(arr.reshape(-1).astype(np.int32).tolist())
            yield pd.DataFrame(rows)

    from graph_data_science_spark.util import widen_scan

    return (
        widen_scan(df)  # decode is kernel-bound: widen a narrow media scan
        .where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batch, out_schema)
    )


def fake_feature_extract(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """(media_id, kind, features array<float>) — deterministic stand-in
    feature extractor: features derived from sha256 of the payload.
    Exercises the full Arrow/mapInPandas plumbing a real CNN/encoder
    batch would use (one model invocation per record batch)."""

    out_schema = "media_id long, kind string, features array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                h = hashlib.sha256(bytes(payload or b"")).digest()
                vec = np.frombuffer(h[: feat_dim * 4], dtype=np.uint32)
                feats.append((vec.astype(np.float32) / np.float32(2**32)).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    from graph_data_science_spark.util import widen_scan

    return (
        widen_scan(df)
        .select("media_id", "kind", "payload")
        .mapInPandas(batch, out_schema)
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) — frame sampling plan for video rows:
    pure column math over metadata (JVM-side), the decode of each
    sampled frame would be a later mapInPandas stage."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
