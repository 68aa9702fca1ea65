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
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time gap sessions with exactly-once emission: a session is
    emitted only when the watermark passes its last event + gap (event-time
    timeout). The input stream must already carry ``withWatermark(ts_col)``
    with a delay ≥ the reordering bound.

    State per key is four scalars (start, end, count, sum) — merging a new
    micro-batch is a fold, not a buffer of raw events, so state stays O(keys)
    not O(events) regardless of session length.
    """
    import pandas as pd

    gap_ms = gap_seconds * 1000
    out_cols = [f.name for f in SESSION_SCHEMA.fields]

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_ms, end_ms, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start": pd.Timestamp(start_ms, unit="ms"),
                        "session_end": pd.Timestamp(end_ms, unit="ms"),
                        "n_events": n,
                        "total_value": tot,
                    }
                ],
                columns=out_cols,
            )
            return
        sessions = []
        if state.exists:
            start_ms, end_ms, n, tot = state.get
        else:
            start_ms = end_ms = None
            n, tot = 0, 0.0
        frames = [pdf for pdf in pdf_iter if not pdf.empty]
        if frames:
            batch = pd.concat(frames).sort_values(ts_col)
            for _, row in batch.iterrows():
                t_ms = int(row[ts_col].value // 1_000_000)
                if end_ms is not None and t_ms - end_ms > gap_ms:
                    sessions.append((start_ms, end_ms, n, tot))
                    start_ms, n, tot = t_ms, 0, 0.0
                if start_ms is None:
                    start_ms = t_ms
                end_ms = max(end_ms or t_ms, t_ms)
                n += 1
                tot += float(row[value_col]) if row[value_col] is not None else 0.0
        expiry = (end_ms or 0) + gap_ms
        if start_ms is not None and expiry <= state.getCurrentWatermarkMs():
            # the watermark already passed this session's gap — a timeout in
            # the past is illegal, so close and emit it right now
            sessions.append((start_ms, end_ms, n, tot))
            state.remove()
        elif start_ms is not None:
            state.update((start_ms, end_ms, n, tot))
            state.setTimeoutTimestamp(expiry)
        if sessions:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start": pd.Timestamp(s, unit="ms"),
                        "session_end": pd.Timestamp(e, unit="ms"),
                        "n_events": c,
                        "total_value": v,
                    }
                    for s, e, c, v in sessions
                ],
                columns=out_cols,
            )
        else:
            yield pd.DataFrame(columns=out_cols)

    return events.groupBy(key_col).applyInPandasWithState(
        fn, SESSION_SCHEMA, _SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
