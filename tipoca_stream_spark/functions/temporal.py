"""Debezium temporal normalization (P4).

The reference receives temporal values as Debezium epoch encodings and
formats them (``pkg/transformer/debezium/message.go:116-266``):

- DATE      = days since epoch            (message.go:132-139)
- DATETIME  = epoch millis or micros, fractional digits decided by the
              source column's length      (message.go:147-201,227-253)
- TIME      = micros of day → HH:MM:SS    (message.go:203-208,254-261)
- TIMESTAMP = ISO string, ``T``/``Z`` stripped (message.go:141-145)

The Spark engine keeps these as proper DateType/TimestampType — an
intentional idiomatic upgrade over the reference's all-strings model
(SURVEY.md §1.1) — with formatting helpers for byte-parity output. All
built-in functions: ``date_add``, ``timestamp_millis``, ``timestamp_micros``,
``date_format`` — JVM-side, codegen'd.

Golden cases (debezium/message_test.go:7-116): days 6807 → 1988-08-21;
days -13023 → 1934-05-07; ms 588175262000 → 1988-08-21 14:01:02;
ms 588175262230 len 2 → …02.23; µs 588175262123456 len 6 → …02.123456;
TIME µs 39600000000 → 11:00:00; ms 1602736317708 len 3 →
2020-10-15 04:31:57.708.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def debezium_date(days: Column) -> Column:
    """Epoch-days int → DateType (message.go:132-139)."""
    return F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int"))


def debezium_datetime_millis(ms: Column) -> Column:
    """Epoch-millis long → TimestampType (message.go:147-175)."""
    return F.timestamp_millis(ms.cast("long"))


def debezium_datetime_micros(us: Column) -> Column:
    """Epoch-micros long → TimestampType (message.go:176-201)."""
    return F.timestamp_micros(us.cast("long"))


def debezium_time_micros(us: Column) -> Column:
    """Micros-of-day long → ``HH:MM:SS`` string (message.go:203-208,254-261).
    The reference truncates fractional seconds for TIME."""
    secs = (us.cast("long") / F.lit(1_000_000)).cast("long")
    return F.date_format(F.timestamp_seconds(secs), "HH:mm:ss")


def debezium_timestamp_iso(ts_string: Column) -> Column:
    """ISO timestamp string: strip ``T`` separator and ``Z`` suffix
    (message.go:141-145)."""
    return F.regexp_replace(F.regexp_replace(ts_string, "T", " "), "Z$", "")


def format_datetime(ts: Column, fractional_digits: int) -> Column:
    """Render a timestamp with the fractional precision implied by the source
    column length (message.go:227-253): 0 digits → seconds, else
    ``.S…`` with that many digits."""
    if fractional_digits <= 0:
        return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss." + "S" * min(fractional_digits, 6))
