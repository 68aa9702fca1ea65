"""Salted-hash masking primitives.

Reference: ``pkg/transformer/masker/masker.go:37-43`` — ``Mask(data) =
hex(sha1(data + salt))``. Golden values (masker_test.go:24-30, salt
``testhash``)::

    Mask("275402") = 95b623a5d57372c26025828015f537ad42104f9c
    Mask("Batman") = 9ba53e85b996f6278aa647d8da8f355aafd16149

Spark's built-in ``sha1``/``sha2``/``md5`` run JVM-side inside codegen, so
masking stays off the Python path entirely. The algorithm is pluggable
because the DuckDB oracle used by the correctness gate lacks ``sha1``; the
engine default remains sha1 for reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALGOS = {"sha1", "sha256", "md5"}


def masked_hash(col: Column, salt: str, algo: str = "sha1") -> Column:
    """hex digest of (value || salt), null-preserving, as the reference does
    (masker.go:37-43 operates on the string form of the value)."""
    if algo not in _ALGOS:
        raise ValueError(f"unsupported mask hash algo {algo!r}; one of {sorted(_ALGOS)}")
    data = F.concat(col.cast("string"), F.lit(salt))
    if algo == "sha1":
        return F.sha1(data)
    if algo == "sha256":
        return F.lower(F.sha2(data, 256))
    return F.md5(data)
