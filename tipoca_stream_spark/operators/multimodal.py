"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature kernels are STUBBED (image/audio libraries are not in
this container — see ``decode_image``); everything Spark-side is real:
schemas, Arrow-batched ``mapInPandas`` plumbing, partition sizing. A real
deployment swaps ``_fake_decode`` for PIL/ffmpeg calls without touching the
plan shape.

Design for 100 TB of media: binary payloads ride in their own column so
column pruning drops them when a query touches only metadata; decode work is
``mapInPandas`` (one Arrow batch per call, not one row); partitioning by
size (``maxPartitionBytes``) keeps one task's batch within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("payload_md5", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container — "
        "use _fake_decode for deterministic tests"
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derives fake dimensions from the
    payload bytes so tests exercise the full plumbing."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    multimodal path has real data to flow through."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def extract_features(media: DataFrame, frame_sample_rate: int = 10) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` (decode stubbed with ``_fake_decode``)."""
    import hashlib

    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                w, h = _fake_decode(payload)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "byte_len": len(payload),
                        "payload_md5": hashlib.md5(payload).hexdigest(),
                        "width": w,
                        "height": h,
                        "n_frames": (len(payload) // frame_sample_rate) or 1,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize plumbing: Arrow-batched ``mapInPandas`` over binary payloads.
    The resample kernel is the stub (a real deployment calls PIL here); the
    deterministic fake truncates the payload proportionally so output sizes
    are testable."""
    import pandas as pd

    def resize(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                w, h = _fake_decode(payload)
                scale = min(1.0, max_dim / max(w, h, 1))
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                keep = max(int(len(payload) * scale * scale), 1) if payload else 0
                rows.append(
                    {"media_id": r["media_id"], "width": nw, "height": nh,
                     "resized": payload[:keep]}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_nth: int = 10, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (1→N mapInPandas). The frame extraction is the stub (ffmpeg in a real
    deployment); the fake slices fixed-width windows so frame counts and
    ordering are fully testable."""
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                n_frames = max(len(payload) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_no": i,
                            "frame": payload[i * frame_bytes : (i + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(sample, FRAME_SCHEMA)
