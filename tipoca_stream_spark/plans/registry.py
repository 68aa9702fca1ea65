"""Registry for the driver-facing query inventory.

Rules that keep the DuckDB oracle comparison honest (driver sorts columns by
name and hashes values):

- alias every computed column identically in Spark and SQL;
- money/metric sums go through DECIMAL so both engines are exact, and are
  cast to double only at the end (the cast of an exact decimal is the same
  double in both engines);
- running/array folds keep a deterministic order so double arithmetic is
  bit-identical;
- timestamps are emitted as formatted strings (Spark session TZ is UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver falls back to rows-only check
    survey_ref: str  # SURVEY.md §2 operator ids this query covers


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, survey_ref: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco
