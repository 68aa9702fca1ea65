"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference engine is stateless between batches (SURVEY.md §2.10 T3 —
state = the target table + committed offsets, `load_processor.go:835-880`),
so reference parity needs none of this. These operators extend the engine
where the target-table-as-state model is too expensive at 100 TB:

- :func:`dedupe_across_batches` keeps the per-PK high-water offset in
  Spark state so stale/duplicate CDC events are suppressed *before* the
  merge ever touches the target table. At scale this turns a
  read-modify-write against a 100 TB table into a state-store lookup —
  the merge then only sees genuinely-new winners. This is M2
  (`redshift.go:666-698` latest-wins dedupe) lifted across micro-batch
  boundaries.
- :func:`sessionize_stateful` builds event-time sessions with a gap
  timeout — the stateful sibling of the batch gap-sessionizer in
  ``operators/sessionize.py``, emitting each session exactly once when
  its gap expires (event-time timeout driven by the watermark).

Both are Arrow-batched (pandas in, pandas out); state is a tuple the
state store serializes natively. Per-key state is O(1) for the dedup
(two longs) and O(1) for sessions (four scalars), so a 1000-executor
cluster shards state by ``groupBy`` key with no skew beyond the key
distribution itself.
"""

from __future__ import annotations

from typing import Iterable, List

import pandas as pd  # noqa: F401  (import verified at module load; used in closures)
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedupe_across_batches(
    events: DataFrame,
    primary_keys: List[str],
    offset_col: str = "kafkaoffset",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch latest-wins dedup: emit an event only if its offset is
    higher than every offset previously seen for its primary key.

    Within one micro-batch only the max-offset row per key is emitted
    (exactly M2's latest-wins); across micro-batches the state store
    remembers the high-water mark, so replayed/duplicate events
    (at-least-once delivery, T4) are suppressed without consulting the
    target table. Output mode: append (each emitted row is final).

    ``state_ttl_ms`` bounds state size for keys that go quiet (processing
    -time timeout); ``None`` keeps state forever — correct but unbounded,
    fine when the PK space is bounded (a CDC table's live rows).
    """
    import pandas as pd

    out_schema = events.schema
    state_schema = T.StructType([T.StructField("max_offset", T.LongType())])
    cols = [f.name for f in out_schema.fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        high = state.get[0] if state.exists else None
        best = None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            cand = pdf.loc[pdf[offset_col].idxmax()]
            if best is None or cand[offset_col] > best[offset_col]:
                best = cand
        if best is not None and (high is None or int(best[offset_col]) > high):
            state.update((int(best[offset_col]),))
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
            yield best.to_frame().T[cols]
        else:
            yield pd.DataFrame(columns=cols)

    return events.groupBy(*primary_keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
        T.StructField("tots", T.ArrayType(T.DoubleType())),
    ]
)


def _fold_event(sessions: list, t: int, v: float, gap_ms: int) -> None:
    """Merge one event into the per-key session list (sorted by start).

    An event lands in the session whose window ``[start - gap, end + gap]``
    contains it (out-of-order events can therefore REOPEN a gap-closed but
    not-yet-emitted session), then adjacent sessions that now sit within one
    gap of each other are merged — an event can bridge two sessions into one.
    The list length is bounded by the reordering window / gap, so the linear
    scan is O(few) per event."""
    placed = False
    for s in sessions:
        if s[0] - gap_ms <= t <= s[1] + gap_ms:
            s[0] = min(s[0], t)
            s[1] = max(s[1], t)
            s[2] += 1
            s[3] += v
            placed = True
            break
    if not placed:
        sessions.append([t, t, 1, v])
        sessions.sort(key=lambda s: s[0])
    i = 0
    while i + 1 < len(sessions):
        a, b = sessions[i], sessions[i + 1]
        if b[0] - a[1] <= gap_ms:
            a[0] = min(a[0], b[0])
            a[1] = max(a[1], b[1])
            a[2] += b[2]
            a[3] += b[3]
            del sessions[i + 1]
        else:
            i += 1


def _fold_batch(sessions: list, ts_ms, vals, gap_ms: int) -> list:
    """Vectorized equivalent of folding every event of a sorted batch via
    :func:`_fold_event` — same final session list, numpy-speed.

    Works because gap-merging is a transitive closure: the result is the
    partition of all points/intervals where consecutive cluster boundaries
    sit more than ``gap_ms`` apart, independent of insertion order. So the
    batch collapses to segments first (``diff > gap`` boundaries on the
    sorted timestamps, ``reduceat`` segment sums), then one linear pass
    merges the handful of segments with the carried state sessions. A hot
    key delivering millions of events in one micro-batch costs one numpy
    scan instead of millions of Python object iterations.

    ``ts_ms`` must be sorted ascending; ``sessions`` is the state list of
    ``[start, end, n, total]`` rows (not mutated).
    """
    import numpy as np

    if len(ts_ms):
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(ts_ms) > gap_ms) + 1)
        )
        seg_sums = np.add.reduceat(vals, bounds)
        hi = np.concatenate((bounds[1:], [len(ts_ms)]))
        segs = [
            [int(ts_ms[lo]), int(ts_ms[h - 1]), int(h - lo), float(s)]
            for lo, h, s in zip(bounds, hi, seg_sums)
        ]
    else:
        segs = []
    out: list = []
    for s in sorted([list(s) for s in sessions] + segs):
        if out and s[0] - out[-1][1] <= gap_ms:
            out[-1][1] = max(out[-1][1], s[1])
            out[-1][2] += s[2]
            out[-1][3] += s[3]
        else:
            out.append(list(s))
    return out


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time gap sessions with exactly-once emission: a session is
    emitted only when the watermark passes its last event + gap — never
    eagerly on an in-batch gap. Gap-closed sessions whose expiry the
    watermark has NOT yet passed stay buffered in state, so an allowed-late
    event arriving in a later micro-batch inside such a session's window
    merges into it (and can bridge two buffered sessions into one) instead
    of spawning an overlapping duplicate. The input stream must already
    carry ``withWatermark(ts_col)`` with a delay ≥ the reordering bound.

    State per key is four scalars per buffered session (start, end, count,
    sum) — a fold, not a buffer of raw events; the buffered-session count is
    bounded by (watermark delay / gap) + 1, so state stays O(keys).

    Emission is safe at ``end + gap <= watermark`` because Spark drops
    events with event time ≤ watermark from stateful processing: a
    surviving event has ``t > watermark >= end + gap`` and can never merge
    into an already-emitted session.
    """
    import pandas as pd

    gap_ms = gap_seconds * 1000
    out_cols = [f.name for f in SESSION_SCHEMA.fields]

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            starts, ends, ns, tots = state.get
            sessions = sorted([list(x) for x in zip(starts, ends, ns, tots)])
        else:
            sessions = []
        if not state.hasTimedOut:
            frames = [pdf for pdf in pdf_iter if not pdf.empty]
            if frames:
                batch = pd.concat(frames).sort_values(ts_col)
                ts_ms = (
                    batch[ts_col].to_numpy("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                vals = (
                    pd.to_numeric(batch[value_col], errors="coerce")
                    .fillna(0.0)
                    .to_numpy(dtype=float)
                )
                sessions = _fold_batch(sessions, ts_ms, vals, gap_ms)
        emit = [s for s in sessions if s[1] + gap_ms <= wm]
        keep = [s for s in sessions if s[1] + gap_ms > wm]
        if keep:
            state.update(
                (
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                    [s[3] for s in keep],
                )
            )
            state.setTimeoutTimestamp(min(s[1] + gap_ms for s in keep))
        elif state.exists:
            state.remove()
        if emit:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start": pd.Timestamp(s, unit="ms"),
                        "session_end": pd.Timestamp(e, unit="ms"),
                        "n_events": c,
                        "total_value": v,
                    }
                    for s, e, c, v in emit
                ],
                columns=out_cols,
            )
        else:
            yield pd.DataFrame(columns=out_cols)

    return events.groupBy(key_col).applyInPandasWithState(
        fn, SESSION_SCHEMA, _SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
