"""Multimodal plumbing tests: REAL header decode goldens (hand-built
PNG/JPEG/GIF/BMP byte fixtures), schemas, Arrow batch shapes, 1→N frame
expansion, and column pruning of the binary payload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tipoca_stream_spark.operators import multimodal as mm
from tipoca_stream_spark.operators.skew import explain_has_exchange

PNG_HDR = 33  # signature + IHDR chunk emitted by png_framed / the adapter


def media_df(spark):
    docs = spark.createDataFrame(
        [(1, "short text", "en", "s", 10), (2, "x" * 700, "en", "s", 700)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return mm.documents_as_media(docs)


# --- header decode goldens (hand-built byte fixtures) -----------------------


def jpeg_bytes(width, height):
    """SOI + APP0 + COM + SOF0, per ITU T.81 marker framing."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + (4).to_bytes(2, "big") + b"hi"
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"  # precision
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + b"\x01\x11\x00"  # 1 component
    )
    return b"\xff\xd8" + app0 + com + sof0


def gif_bytes(width, height):
    return b"GIF89a" + width.to_bytes(2, "little") + height.to_bytes(2, "little") + b"\x00" * 4


def bmp_bytes(width, height):
    hdr = bytearray(b"BM" + b"\x00" * 24)
    hdr[18:22] = width.to_bytes(4, "little", signed=True)
    hdr[22:26] = height.to_bytes(4, "little", signed=True)
    return bytes(hdr)


def test_png_header_golden():
    assert mm.decode_image_header(mm.png_framed(640, 480, b"body")) == ("png", 640, 480)


def test_jpeg_header_golden_walks_past_segments():
    assert mm.decode_image_header(jpeg_bytes(1920, 1080)) == ("jpeg", 1920, 1080)
    # progressive SOF2 instead of baseline SOF0
    prog = jpeg_bytes(32, 16).replace(b"\xff\xc0", b"\xff\xc2")
    assert mm.decode_image_header(prog) == ("jpeg", 32, 16)


def test_gif_and_bmp_header_golden():
    assert mm.decode_image_header(gif_bytes(320, 200)) == ("gif", 320, 200)
    assert mm.decode_image_header(bmp_bytes(123, 45)) == ("bmp", 123, 45)
    # top-down BMP stores negative height
    assert mm.decode_image_header(bmp_bytes(123, -45)) == ("bmp", 123, 45)


def test_unrecognized_bytes_return_none():
    assert mm.decode_image_header(b"") is None
    assert mm.decode_image_header(b"plain text payload") is None
    assert mm.decode_image_header(b"\xff\xd8\x00\x00") is None  # broken JPEG


def test_adapter_payload_parses_as_real_png(spark):
    # documents_as_media builds the PNG frame with JVM expressions; the
    # Python-side parser must read it back identically
    row = media_df(spark).filter(F.col("media_id") == 2).collect()[0]
    payload = bytes(row["payload"])
    assert mm.decode_image_header(payload) == ("png", (700 % 640) + 1, (700 % 480) + 1)
    assert payload[PNG_HDR:] == b"x" * 700


# --- mapInPandas plumbing ---------------------------------------------------


def test_extract_features_shapes(spark):
    feats = {r["media_id"]: r for r in mm.extract_features(media_df(spark)).collect()}
    assert feats[1]["byte_len"] == 10 + PNG_HDR
    assert feats[2]["byte_len"] == 700 + PNG_HDR
    assert feats[2]["width"] == (700 % 640) + 1  # real IHDR parse
    assert feats[2]["height"] == (700 % 480) + 1
    assert len(feats[1]["payload_md5"]) == 32
    assert feats[2]["n_frames"] == (700 + PNG_HDR) // 10


def test_extract_features_null_dims_for_unknown_bytes(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"not an image"), "application/octet-stream", {})],
        mm.MEDIA_SCHEMA,
    )
    r = mm.extract_features(media).collect()[0]
    assert r["width"] is None and r["height"] is None
    assert r["byte_len"] == len(b"not an image")


def test_resize_bounds(spark):
    rows = {r["media_id"]: r for r in mm.resize_images(media_df(spark), max_dim=32).collect()}
    for r in rows.values():
        assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 32
        assert len(bytes(r["resized"])) <= 700 + PNG_HDR


def test_resize_passthrough_for_unknown_bytes(spark):
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"opaque"), "application/octet-stream", {})],
        mm.MEDIA_SCHEMA,
    )
    r = mm.resize_images(media).collect()[0]
    assert r["width"] is None and bytes(r["resized"]) == b"opaque"


def test_sample_frames_expansion(spark):
    frames = mm.sample_frames(media_df(spark), every_nth=2, frame_bytes=100).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
    assert by_media[1] == [0]  # 43 bytes → 1 frame
    assert by_media[2] == [0, 2, 4, 6]  # 733//100 = 7 frames, every 2nd
    f0 = next(bytes(r["frame"]) for r in frames if r["media_id"] == 2 and r["frame_no"] == 0)
    assert f0[:8] == mm.PNG_SIG  # frame 0 starts at the payload start
    assert len(f0) == 100


def test_metadata_query_prunes_payload(spark, tmp_path):
    """Scanning only metadata must not read the binary payload column —
    the core reason payloads live in their own column."""
    p = str(tmp_path / "media")
    media_df(spark).write.parquet(p)
    scan = spark.read.parquet(p).select("media_id", "kind", "mime")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruned at the parquet scan
    assert not explain_has_exchange(scan)


def test_pixel_decode_rejects_dataless_frame():
    # header-only PNG frame (no IDAT) is corrupt, not merely unsupported
    with pytest.raises(ValueError):
        mm.decode_image(mm.png_framed(2, 2))


def test_wav_header_decode_golden():
    from tipoca_stream_spark.operators.multimodal import decode_audio_header, wav_framed

    fmt, ch, rate, bits, dur = decode_audio_header(wav_framed(2, 44100, 16, 44100))
    assert (fmt, ch, rate, bits, dur) == ("wav", 2, 44100, 16, 1000)
    assert decode_audio_header(b"RIFFxxxxNOPE") is None
    assert decode_audio_header(b"") is None


def test_mp4_header_decode_golden():
    from tipoca_stream_spark.operators.multimodal import decode_video_header, mp4_framed

    assert decode_video_header(mp4_framed(2500, 600)) == ("mp4", 2500)
    assert decode_video_header(mp4_framed(0, 1000)) == ("mp4", 0)
    assert decode_video_header(b"\x00\x00\x00\x08free") is None  # no ftyp


def test_features_sniff_audio_video(spark):
    from tipoca_stream_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        mp4_framed,
        png_framed,
        wav_framed,
    )

    rows = [
        (1, "image", bytearray(png_framed(64, 32)), "image/png", None),
        (2, "audio", bytearray(wav_framed(1, 16000, 16, 8000)), "audio/wav", None),
        (3, "video", bytearray(mp4_framed(1234, 90000)), "video/mp4", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert (out[1]["width"], out[1]["height"]) == (64, 32)
    assert (out[2]["channels"], out[2]["sample_rate"], out[2]["duration_ms"]) == (1, 16000, 500)
    assert out[3]["duration_ms"] == 1234 and out[3]["width"] is None


def test_bmp_resize_is_real_nearest_neighbor():
    import numpy as np

    from tipoca_stream_spark.operators.multimodal import (
        bmp_framed,
        decode_image_header,
        resize_bmp,
    )

    src = bmp_framed(8, 4)
    out = resize_bmp(src, 4)
    assert decode_image_header(out) == ("bmp", 4, 2)

    def pixels_td(b):
        off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        st = (w * 3 + 3) // 4 * 4
        a = np.frombuffer(b, dtype=np.uint8, count=st * h, offset=off)
        return a.reshape(h, st)[:, : w * 3].reshape(h, w, 3)[::-1]

    s, o = pixels_td(src), pixels_td(out)
    # conventional top-down NN: out[y, x] == src[y*h//nh, x*w//nw]
    for y in range(2):
        for x in range(4):
            assert (o[y, x] == s[y * 4 // 2, x * 8 // 4]).all()
    # non-BMP and compressed payloads fall back to the stub path
    assert resize_bmp(b"\x89PNGxxxx", 4) is None


def test_resize_operator_uses_real_bmp_kernel(spark):
    from tipoca_stream_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        bmp_framed,
        decode_image_header,
        resize_images,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(bmp_framed(64, 32)), "image/bmp", None)], MEDIA_SCHEMA
    )
    row = resize_images(media, max_dim=16).collect()[0]
    assert (row["width"], row["height"]) == (16, 8)
    # output is a VALID BMP of the new size, not a truncated payload
    assert decode_image_header(bytes(row["resized"])) == ("bmp", 16, 8)


def _sine_wav(rate=8000, n=8000, freq=440, amp=0.5, channels=1):
    import numpy as np

    from tipoca_stream_spark.operators.multimodal import wav_framed

    t = np.arange(n) / rate
    sig = (np.sin(2 * np.pi * freq * t) * 32767 * amp).astype("<i2")
    if channels == 2:
        sig = np.repeat(sig, 2)
    base = wav_framed(channels, rate, 16, 0)
    return base[: len(base) - 8] + b"data" + (2 * len(sig)).to_bytes(4, "little") + sig.tobytes()


def test_wav_pcm_features_sine_golden():
    from tipoca_stream_spark.operators.multimodal import wav_pcm_features

    f = wav_pcm_features(_sine_wav())
    assert abs(f["rms"] - 0.5 / 2**0.5) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    assert abs(f["zero_crossings"] - 880) <= 2  # 2 crossings per 440Hz cycle
    assert f["duration_ms"] == 1000
    # stereo mixdown preserves the mono signal
    f2 = wav_pcm_features(_sine_wav(channels=2))
    assert abs(f2["rms"] - f["rms"]) < 1e-6 and f2["channels"] == 2
    from tipoca_stream_spark.operators.multimodal import png_framed

    assert wav_pcm_features(png_framed(4, 4)) is None


def test_audio_features_operator(spark):
    from tipoca_stream_spark.operators.multimodal import MEDIA_SCHEMA, audio_features, png_framed

    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(_sine_wav()), "audio/wav", None),
            (2, "image", bytearray(png_framed(4, 4)), "image/png", None),
        ],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    assert abs(out[1]["rms"] - 0.3536) < 1e-3 and out[1]["sample_rate"] == 8000
    assert out[2]["rms"] is None  # non-audio rows: NULL features, not errors


def test_mp4_sample_table_roundtrip():
    from tipoca_stream_spark.operators.multimodal import (
        mp4_framed,
        mp4_framed_with_samples,
        mp4_sample_table,
    )

    samples = [b"frame-zero!", b"f1", b"frame-two-bytes", b"f3", b"f4"]
    payload = mp4_framed_with_samples(samples)
    table = mp4_sample_table(payload)
    assert [payload[o : o + n] for o, n in table] == samples
    assert mp4_sample_table(mp4_framed(1000)) is None  # no stbl → None
    assert mp4_sample_table(b"garbage") is None


def test_sample_frames_uses_real_mp4_table(spark):
    from tipoca_stream_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        mp4_framed_with_samples,
        sample_frames,
    )

    samples = [f"sample-{i}".encode() for i in range(10)]
    media = spark.createDataFrame(
        [(1, "video", bytearray(mp4_framed_with_samples(samples)), "video/mp4", None)],
        MEDIA_SCHEMA,
    )
    out = sorted(
        (r["frame_no"], bytes(r["frame"])) for r in sample_frames(media, every_nth=3).collect()
    )
    # every 3rd REAL compressed sample, exact bytes
    assert out == [(0, b"sample-0"), (3, b"sample-3"), (6, b"sample-6"), (9, b"sample-9")]


# --- PNG pixel decode (stdlib zlib + filter reversal) -----------------------


def _gradient(h, w, ch):
    import numpy as np

    y, x, c = np.ogrid[:h, :w, :ch]
    return ((x * 7 + y * 13 + c * 29) % 256).astype(np.uint8)


def test_decode_png_roundtrip_rgb_rgba_gray():
    import numpy as np

    from tipoca_stream_spark.operators import multimodal as mm

    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = _gradient(5, 7, ch)
        out = mm.decode_png(mm.png_encoded(px, color_type=color_type))
        assert out is not None and out.shape == (5, 7, ch)
        assert np.array_equal(out, px), f"color_type={color_type}"


def test_decode_png_all_filter_types():
    # forward-filter known pixels with each of Sub/Up/Average/Paeth and
    # check the decoder reconstructs them (spec §9 inverse)
    import struct
    import zlib

    import numpy as np

    from tipoca_stream_spark.operators import multimodal as mm

    h, w, ch = 5, 6, 3
    px = _gradient(h, w, ch)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    raw = bytearray()
    filters = [0, 1, 2, 3, 4]
    for y, f in enumerate(filters):
        raw.append(f)
        up = flat[y - 1] if y else np.zeros(stride, dtype=int)
        for x in range(stride):
            left = flat[y][x - ch] if x >= ch else 0
            ul = up[x - ch] if x >= ch else 0
            pred = {0: 0, 1: left, 2: up[x], 3: (left + up[x]) // 2,
                    4: paeth(left, up[x], ul)}[f]
            raw.append((flat[y][x] - pred) & 0xFF)

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    payload = (mm.PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    out = mm.decode_png(payload)
    assert out is not None and np.array_equal(out, px)


def test_decode_png_multiple_idat_chunks():
    import struct
    import zlib

    import numpy as np

    from tipoca_stream_spark.operators import multimodal as mm

    px = _gradient(4, 4, 3)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(4))
    comp = zlib.compress(raw)
    mid = len(comp) // 2

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    payload = (mm.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp[:mid])
               + chunk(b"IDAT", comp[mid:]) + chunk(b"IEND", b""))
    assert np.array_equal(mm.decode_png(payload), px)


def test_decode_image_png_bmp_real_corrupt_jpeg_rejected():
    import numpy as np
    import pytest

    from tipoca_stream_spark.operators import multimodal as mm

    px = _gradient(3, 4, 3)
    assert np.array_equal(mm.decode_image(mm.png_encoded(px)), px)

    bmp = mm.bmp_framed(3, 2)  # default gradient, (b,g,r) tuples per row
    out = mm.decode_image(bmp)
    assert out.shape == (2, 3, 3)
    # decode returns rows top-down in stored BGR order; spot-check a pixel
    assert tuple(out[0][1]) == ((1 * 7) % 256, 0 % 256, (1 + 0) % 256)

    # truncated-but-headered JPEG: header parses, pixel decode must raise
    jpeg = b"\xff\xd8\xff\xc0" + (9).to_bytes(2, "big") + bytes([8]) + (2).to_bytes(2, "big") + (3).to_bytes(2, "big") + b"\x01"
    assert mm.decode_image_header(jpeg) == ("jpeg", 3, 2)
    with pytest.raises(ValueError):
        mm.decode_image(jpeg)


def test_decode_png_rejects_unsupported_variants():
    from tipoca_stream_spark.operators import multimodal as mm

    px = _gradient(2, 2, 3)
    good = bytearray(mm.png_encoded(px))
    bad_depth = bytearray(good); bad_depth[24] = 16
    bad_interlace = bytearray(good); bad_interlace[28] = 1
    bad_palette = bytearray(good); bad_palette[25] = 3
    for payload in (bad_depth, bad_interlace, bad_palette):
        assert mm.decode_png(bytes(payload)) is None
    # the adapter's header-only PNG frames (no IDAT) must decode to None,
    # not crash
    assert mm.decode_png(mm.png_framed(10, 10, b"not idat")) is None


def test_decode_png_native_unfilter_matches_pure():
    """Round 10b: the compiled png_unfilter must be byte-identical to the
    per-pixel Python loop on arbitrary filtered streams — random data
    under random per-row filter types (0-4), every color type, including
    w=1 (the x < ch edge where the left neighbor does not exist)."""
    import struct
    import zlib

    import numpy as np

    from tipoca_stream_spark.operators import imagecodec as ic
    from tipoca_stream_spark.operators import multimodal as mm

    if ic._native_lib() is None:
        import pytest as _pytest

        _pytest.skip("no C compiler on this host")

    def chunk(typ, body):
        return (len(body).to_bytes(4, "big") + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    rng = np.random.default_rng(31)
    for color_type, ch in ((0, 1), (4, 2), (2, 3), (6, 4)):
        for w, h in ((1, 7), (13, 11), (40, 3)):
            stride = w * ch
            raw = bytearray()
            for _ in range(h):
                raw.append(int(rng.integers(0, 5)))
                raw += bytes(rng.integers(0, 256, size=stride, dtype=np.uint8))
            ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                    + bytes([8, color_type, 0, 0, 0]))
            payload = (mm.PNG_SIG + chunk(b"IHDR", ihdr)
                       + chunk(b"IDAT", zlib.compress(bytes(raw)))
                       + chunk(b"IEND", b""))
            native = mm.decode_png(payload)
            saved, ic._NATIVE = ic._NATIVE, None
            saved_tried, ic._NATIVE_TRIED = ic._NATIVE_TRIED, True
            try:
                pure = mm.decode_png(payload)
            finally:
                ic._NATIVE, ic._NATIVE_TRIED = saved, saved_tried
            assert native is not None and pure is not None
            assert np.array_equal(native, pure), (color_type, w, h)


# --- dedup funnel: flag/window form vs the survivor-chain reference ----------


def test_funnel_flags_match_survivor_chain_reference(spark):
    """funnel_over_docs (round 14: cumulative window flags + one
    aggregate) must match a brute-force replay of the original survivor
    chain — keep-smallest-media_id per fingerprint group among CURRENT
    survivors, stage by stage — over the actually-computed fingerprints.
    Corpus crafted with exact-duplicate groups (identical text => all
    three fingerprints collide) and empty texts (excluded from the img
    base population by phash's n>=1 filter)."""
    from tipoca_stream_spark.operators.audiofp import audio_fingerprints
    from tipoca_stream_spark.operators.phash import phash_from_documents
    from tipoca_stream_spark.operators.videofp import video_fingerprints
    from tipoca_stream_spark.plans.training import funnel_over_docs

    texts = (
        ["alpha beta gamma"] * 3
        + ["delta epsilon zeta eta"] * 2
        + [""]  # dropped from the base population
        + [f"doc number {i} with words " + "w " * (i % 7) for i in range(12)]
    )
    docs = spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    img = {
        r["media_id"]: r["phash"]
        for r in phash_from_documents(docs).select("media_id", "phash").collect()
    }
    aud = {
        r["media_id"]: r["fingerprint"]
        for r in audio_fingerprints(docs).select("media_id", "fingerprint").collect()
    }
    vid = {
        r["media_id"]: r["fingerprint"]
        for r in video_fingerprints(docs).select("media_id", "fingerprint").collect()
    }

    def survivors(prev, fps):
        cur = {m: fps[m] for m in prev if m in fps}
        keep_min = {}
        for m, fp in cur.items():
            if fp not in keep_min or m < keep_min[fp]:
                keep_min[fp] = m
        return {m for m, fp in cur.items() if keep_min[fp] == m}

    base = set(img)
    s1 = survivors(base, img)
    s2 = survivors(s1, aud)
    s3 = survivors(s2, vid)
    expect = {
        "all": len(base),
        "after_image_dedup": len(s1),
        "after_audio_dedup": len(s2),
        "after_video_dedup": len(s3),
    }

    got = {r["name"]: r["n_docs"] for r in funnel_over_docs(docs).collect()}
    assert got == expect
    # the dup groups must actually collapse, or the fixture tests nothing
    assert expect["after_image_dedup"] <= expect["all"] - 3
