"""Video sample-size fingerprinting — the video member of the
perceptual near-dup family (siblings: operators/phash.py images,
operators/audiofp.py audio).

Without a video codec in the container (the documented stub boundary),
the codec-independent signal is the compressed FRAME SIZE sequence:
frame sizes track scene complexity and GOP structure, and
size-sequence signatures are a standard cheap video-dedup key (the
byte-range walk is the same one sample_frames uses).  The fingerprint
is all-integer and therefore value-exact under the DuckDB oracle:

  1. the per-document frame-size sequence is deterministic, and it
     rides a REAL ISO-BMFF round-trip — the reader resolves
     moov/trak/mdia/minf/stbl (stsz + stsc + stco) to per-sample byte
     ranges via mp4_sample_table, no fixed offsets;
  2. sizes resample onto a 64-slot grid with integer indices
     ((t * n_frames) // 64);
  3. bits threshold at the exact median of the 64 resampled sizes.

Documents in the same 16-id BLOCK share the size sequence (and frame
count) and differ in ONE enlarged frame each — non-degenerate near-dup
populations at small nonzero Hamming distances. Bounded block size
plus a per-block size STEP keep the IDENTICAL-fingerprint pair
population linear in the corpus (a fixed step only phase-shifted the
sequence — cross-block fingerprints collided wholesale at sf0.1); the
remaining tail is genuine near-miss structure between similar-step
blocks.

100 TB shape: one Arrow-batched mapInPandas pass, no shuffle; pair
generation reuses the pigeonhole band equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VFP_SLOTS = 64


def vfp_n_frames(media_id: int) -> int:
    """Block-derived frame count: docs in the same 16-id block align
    frame-for-frame."""
    return 24 + 6 * ((media_id // 16) % 8)


def vfp_frame_size(media_id: int, j: int, n_frames: int) -> int:
    """Deterministic compressed-frame size with one perturbed frame per
    document (the near-dup construction)."""
    base = 40 + ((media_id // 16) * 13 + j * (11 + (media_id // 16) % 23)) % 160
    return base + (16 if j == media_id % n_frames else 0)


VFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fingerprint", T.StringType(), False),
    ]
)


def video_fingerprints(documents: DataFrame) -> DataFrame:
    """(media_id, n_frames, fingerprint): build the deterministic
    frame-size sequence, frame it as a REAL MP4 (ftyp + moov sample
    table + mdat), walk the container back to per-sample byte ranges,
    and fingerprint the recovered size sequence."""
    import pandas as pd  # noqa: F401 (documents the mapInPandas contract)

    docs = documents.select(F.col("doc_id").cast("long").alias("media_id"))

    def fp_batch(batches):
        import numpy as np
        import pandas as pd

        from tipoca_stream_spark.operators.multimodal import (
            mp4_framed_with_samples,
            mp4_sample_table,
        )

        t = np.arange(VFP_SLOTS, dtype=np.int64)
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                nf = vfp_n_frames(mid)
                samples = [
                    bytes([(mid + j) % 256]) * vfp_frame_size(mid, j, nf)
                    for j in range(nf)
                ]
                payload = mp4_framed_with_samples(samples)
                table = mp4_sample_table(payload)
                if table is None or len(table) != nf:
                    raise ValueError("MP4 sample-table roundtrip failed")
                sizes = np.asarray([s for _, s in table], dtype=np.int64)
                grid = sizes[(t * nf) // VFP_SLOTS]
                med = float(np.median(grid))
                bits = "".join("1" if v > med else "0" for v in grid)
                rows.append((mid, nf, bits))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "fingerprint"]
            )

    # no shuffle: fingerprinting is embarrassingly parallel over the scan
    return docs.mapInPandas(fp_batch, VFP_SCHEMA)
