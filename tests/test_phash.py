"""Unit pins for the pHash image-dedup family (operators/phash.py) —
the oracle sweep (test_queries_oracle) covers value equality; these pin
the construction invariants the oracle can't see."""

import numpy as np
import pytest

from tipoca_stream_spark.operators.phash import (
    PHASH_LOW,
    PHASH_N,
    PHASH_SCALE,
    band_bounds,
    cos_table,
    synth_dims,
)


def test_cos_table_shape_and_bounds():
    ct = cos_table()
    assert len(ct) == PHASH_LOW and all(len(r) == PHASH_N for r in ct)
    assert all(abs(c) <= PHASH_SCALE for r in ct for c in r)
    # DC row is the constant +scale: median thresholding needs the
    # low-band layout to start with the energy row
    assert all(c == PHASH_SCALE for c in ct[0])
    # worst-case |coefficient| stays exactly representable in int64
    # (and in the DOUBLE the SQL median comparison casts to)
    assert 255 * PHASH_SCALE * PHASH_SCALE * PHASH_N * PHASH_N < 2**53


def test_band_bounds_partition_the_hash():
    for n_bands in (2, 7, 9, 64):
        bounds = band_bounds(64, n_bands)
        assert len(bounds) == n_bands
        covered = []
        for s, ln in bounds:
            assert ln >= 1
            covered.extend(range(s, s + ln))
        assert covered == list(range(1, 65))


def test_synth_dims_are_encodable():
    for n in range(1, 200):
        w, h = synth_dims(n)
        assert w in (8, 12, 16) and h in (8, 12, 16)


def test_phash_pairs_within_class_are_close(spark):
    """Two docs in the same 16-id block (sharing dims) differ in
    exactly two pixels (each one's perturbation) — their hashes must
    land within the banding threshold."""
    from tipoca_stream_spark.operators.phash import (
        phash_from_documents,
        phash_near_dups,
    )

    # ids in the same 16-id block; equal text lengths share dims
    rows = [(i, "x" * 30) for i in (0, 8, 12, 3, 11)] + [(5, "y" * 31)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ph = phash_from_documents(docs).collect()
    assert len(ph) == 6
    by_id = {r["media_id"]: r["phash"] for r in ph}
    assert all(len(v) == 64 and set(v) <= {"0", "1"} for v in by_id.values())
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dups(
            phash_from_documents(docs), max_hamming=8
        ).collect()
    }
    assert (0, 8) in pairs and (0, 12) in pairs and (8, 12) in pairs
    assert all(h <= 8 for h in pairs.values())


def test_audio_fingerprint_classes_and_wav_roundtrip(spark):
    """Audio sibling: docs in the same 16-id block share a base signal
    and a length, so their fingerprints land within the banding
    threshold; the WAV container walk must recover the sample rate."""
    from tipoca_stream_spark.operators.audiofp import audio_fingerprints
    from tipoca_stream_spark.operators.phash import phash_near_dups

    docs = spark.createDataFrame(
        [(i, "t") for i in (0, 8, 12, 5, 13)], ["doc_id", "text"]
    )
    fp = audio_fingerprints(docs).collect()
    assert len(fp) == 5
    by_id = {r["media_id"]: r for r in fp}
    for mid, r in by_id.items():
        assert r["sample_rate"] == 8000 * (1 + mid % 3)
        assert len(r["fingerprint"]) == 64
        assert set(r["fingerprint"]) <= {"0", "1"}
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dups(
            audio_fingerprints(docs).select("media_id", "fingerprint"),
            max_hamming=8,
            hash_col="fingerprint",
        ).collect()
    }
    assert (0, 8) in pairs and (0, 12) in pairs and (5, 13) in pairs
    assert all(h <= 8 for h in pairs.values())


def test_afp_table_bounds():
    from tipoca_stream_spark.operators.audiofp import (
        AFP_BINS,
        AFP_SCALE,
        AFP_WIN_LEN,
        afp_cos_table,
    )

    act = afp_cos_table()
    assert len(act) == AFP_BINS and all(len(r) == AFP_WIN_LEN for r in act)
    assert all(abs(c) <= AFP_SCALE for r in act for c in r)
    # worst case |energy| stays exact in int64 AND in the DOUBLE the
    # SQL median comparison casts to
    assert 32512 * AFP_SCALE * AFP_WIN_LEN < 2**53


def test_video_fingerprint_roundtrip_and_classes(spark):
    """Video sibling: the MP4 sample-table walk must recover the exact
    frame-size sequence, and block-mates must land within the banding
    threshold."""
    from tipoca_stream_spark.operators.phash import phash_near_dups
    from tipoca_stream_spark.operators.videofp import (
        vfp_n_frames,
        video_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, "t") for i in (1, 9, 13, 4)], ["doc_id", "text"]
    )
    fp = video_fingerprints(docs).collect()
    by_id = {r["media_id"]: r for r in fp}
    for mid, r in by_id.items():
        assert r["n_frames"] == vfp_n_frames(mid)
        assert len(r["fingerprint"]) == 64
        assert set(r["fingerprint"]) <= {"0", "1"}
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dups(
            video_fingerprints(docs).select("media_id", "fingerprint"),
            max_hamming=8,
            hash_col="fingerprint",
        ).collect()
    }
    assert (1, 9) in pairs and (1, 13) in pairs and (9, 13) in pairs
    assert all(h <= 8 for h in pairs.values())


def test_group_rep_degenerate_mega_group(spark):
    """The round-11 scale pin (VERDICT r10 'What's wrong' #3): a
    mega-dup group of m identical fingerprints costs O(m) rows in the
    group-representative shape — the pair shape would emit m(m-1)/2.
    Also pins the one-hop rep rule: a group whose fingerprint has a
    within-threshold neighbor with a smaller min-id adopts that
    neighbor's min-id as rep."""
    from tipoca_stream_spark.operators.phash import phash_group_reps

    fa = "0" * 64                 # mega group, members 100..1099
    fb = "1" + "0" * 63           # hamming 1 from fa, member 5
    fc = "1" * 64                 # isolated, member 7
    rows = [(i, fa) for i in range(100, 1100)] + [(5, fb), (7, fc)]
    ph = spark.createDataFrame(rows, ["media_id", "phash"])
    out = phash_group_reps(ph, max_hamming=8).collect()
    assert len(out) == 1002       # exactly one row per member: O(m)
    by_id = {r["member_id"]: (r["rep_id"], r["hamming"]) for r in out}
    # every mega-group member maps to the neighbor group's smaller min-id
    for i in range(100, 1100):
        assert by_id[i] == (5, 1)
    assert by_id[5] == (5, 0)     # self-representative keeper
    assert by_id[7] == (7, 0)     # isolated group keeps itself
