"""Audio spectral fingerprinting — the audio member of the perceptual
near-dup family (image sibling: operators/phash.py): decode real WAV
payloads, reduce each signal to a 64-bit windowed-spectrum fingerprint,
and find near-duplicates by Hamming distance with the shared pigeonhole
banding.

The construction is the standard audio-fingerprint shape (windowed
spectral energies thresholded per recording — cf. Haitsma & Kalker,
"A Highly Robust Audio Fingerprinting System", ISMIR 2002 — public
literature), reduced to the repo's exactness contract:

  1. the PCM signal is a deterministic function of doc_id, carried
     through a REAL RIFF/WAV round-trip (the parse is the work an
     audio corpus pays);
  2. the signal resamples onto an 8-window x 64-sample grid with
     integer index arithmetic ((t * ns) // 512);
  3. each window's 8 spectral bins are fixed-point DCT sums
     (round(cos * 1024)), exact int64 (|e| <= 2^41 < 2^53);
  4. the 64 energies threshold at their exact median;
  5. the fingerprint is the row-major '1'/'0' string over
     (window, bin).

Near-dup populations are guaranteed non-degenerate AND linear in the
corpus: documents in the same 16-id BLOCK share a base signal (and a
block-derived length) and differ in ONE perturbed sample each, so
in-block pairs land at small nonzero Hamming distances. Blocks have
bounded size AND the sawtooth STEP varies per block, so the
IDENTICAL-fingerprint pair population stays linear in the corpus (a
fixed step only phase-shifts the same waveform — cross-block
fingerprints collided wholesale and the pair set went quadratic,
1.56M at sf0.1); the remaining tail is genuine near-miss structure
between similar-step blocks, corpus-shaped as in real data.

100 TB shape: fingerprinting is one Arrow-batched mapInPandas pass, no
shuffle; candidate generation is the banded equi-join from phash (no
all-pairs product).
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AFP_WINDOWS = 8
AFP_WIN_LEN = 64
AFP_BINS = 8
AFP_SCALE = 1024


@lru_cache(maxsize=1)
def afp_cos_table() -> tuple[tuple[int, ...], ...]:
    """8x64 fixed-point DCT-II basis over a 64-sample window:
    act[b][k] = round(cos(pi*(2k+1)*b / 128) * 1024) — shared verbatim
    with the generated oracle SQL."""
    return tuple(
        tuple(
            int(round(math.cos(math.pi * (2 * k + 1) * b / (2 * AFP_WIN_LEN))
                      * AFP_SCALE))
            for k in range(AFP_WIN_LEN)
        )
        for b in range(AFP_BINS)
    )


def afp_n_samples(media_id: int) -> int:
    """Block-derived signal length: docs in the same 16-id block share
    a length, so in-block signals align sample-for-sample."""
    return 50 + 25 * ((media_id // 16) % 8)


AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("fingerprint", T.StringType(), False),
    ]
)


def audio_fingerprints(documents: DataFrame) -> DataFrame:
    """(media_id, sample_rate, fingerprint): build the deterministic
    16-bit mono signal per document, frame it as a REAL RIFF/WAV
    payload, parse the payload back (container walk + frombuffer — the
    actual decode work), then window/DCT/threshold to 64 bits."""
    import pandas as pd  # noqa: F401 (documents the mapInPandas contract)

    docs = documents.select(F.col("doc_id").cast("long").alias("media_id"))

    def fp_batch(batches):
        import numpy as np
        import pandas as pd

        from tipoca_stream_spark.operators.multimodal import wav_framed

        act = np.asarray(afp_cos_table(), dtype=np.int64)  # (8, 64)
        t = np.arange(AFP_WINDOWS * AFP_WIN_LEN, dtype=np.int64)  # 0..511
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                ns = afp_n_samples(mid)
                rate = 8000 * (1 + mid % 3)
                i = np.arange(ns, dtype=np.int64)
                # base in [-32000, 31999]; the +512 perturbation at one
                # class-varying position stays inside int16
                base = ((mid // 16) * 31 + i * (2857 + 2 * ((mid // 16) % 997))) % 64000 - 32000
                base[mid % ns] += 512
                payload = wav_framed(
                    channels=1, sample_rate=rate, bits=16,
                    data=base.astype("<i2").tobytes(),
                )
                # REAL container parse: walk RIFF chunks to the data
                # chunk rather than trusting a fixed 44-byte header
                pos = 12
                data = None
                got_rate = None
                while pos + 8 <= len(payload):
                    cid = payload[pos : pos + 4]
                    sz = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                    if cid == b"fmt ":
                        got_rate = int.from_bytes(
                            payload[pos + 12 : pos + 16], "little"
                        )
                    elif cid == b"data":
                        data = payload[pos + 8 : pos + 8 + sz]
                        break
                    pos += 8 + sz + (sz & 1)
                if data is None or got_rate is None:
                    raise ValueError("malformed WAV frame")
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                pos_grid = (t * len(s)) // (AFP_WINDOWS * AFP_WIN_LEN)
                grid = s[pos_grid].reshape(AFP_WINDOWS, AFP_WIN_LEN)
                e = grid @ act.T  # (8 windows, 8 bins) exact int64
                med = float(np.median(e))
                bits = "".join(
                    "1" if v > med else "0" for v in e.reshape(-1)
                )
                rows.append((mid, got_rate, bits))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "fingerprint"]
            )

    # no shuffle: fingerprinting is embarrassingly parallel over the scan
    return docs.mapInPandas(fp_batch, AFP_SCHEMA)
