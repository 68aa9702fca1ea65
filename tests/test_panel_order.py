"""Pin the driver correctness-panel rotation (round 11): the driver
grades the FIRST 50 entries of ``plans.QUERIES``; rounds 1-10 graded the
same insertion-ordered prefix, so 157/222 queries never had a driver-side
CORRECTNESS row. The reorder in plans/__init__.py must keep the
reference-parity spine and put >= 15 never-graded queries in the prefix.
"""

import glob
import json
import os

from tipoca_stream_spark.plans import QUERIES, _PANEL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPINE = [
    "cdc_merge_lww",
    "m2_dedupe_latest",
    "m3_delete_common_anti",
    "m4_delete_op_filter",
    "a1_batch_event_counts",
    "s10_tombstone_skip",
    "mask_pipeline",
]


def test_first_fifty_is_the_panel():
    names = list(QUERIES)
    assert names[: len(_PANEL)] == _PANEL
    assert len(_PANEL) == 50
    assert len(set(_PANEL)) == 50


def test_panel_keeps_spine_and_rotates_in_never_graded():
    graded = set()  # what the driver graded BEFORE the round-13 wave-3 rotation
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        digits = "".join(c for c in os.path.basename(f) if c.isdigit())
        if digits and int(digits) <= 12:
            graded |= set(json.load(open(f)))
    for name in SPINE:
        assert name in _PANEL[:10]
    never = [n for n in _PANEL if n not in graded]
    assert len(never) >= 35, f"only {len(never)} first-time-graded slots"
    # r11's one red row (unsortable array output) was fixed in r12; it may
    # rotate off the panel only with a GREEN driver-side row on record
    r12 = json.load(open(os.path.join(REPO, "CORRECTNESS_r12.json")))
    assert (
        "embed_quantize_int8" in _PANEL
        or r12["embed_quantize_int8"]["hash_match"] is True
    )


def test_panel_entries_all_have_exact_oracles():
    for name in _PANEL:
        assert QUERIES[name].oracle is not None, name


def test_driver_queries_dict_preserves_panel_prefix():
    """The driver grades queries() (not QUERIES directly): the exported
    dict must preserve the panel prefix through the wrap."""
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    assert names[: len(_PANEL)] == _PANEL
    oracles = entrymod.oracle_sql()
    for name in _PANEL:
        assert name in oracles
