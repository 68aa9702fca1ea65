"""Sequence packing: chunk a tokenized corpus into fixed-length training
sequences (the GPT-style pre-training layout — concatenate every
document's token stream in a deterministic corpus order, then cut the
stream every ``seq_len`` tokens; the final partial chunk is kept and
flagged by its length).

Reference parity note: the reference system (practo/tipoca-stream) has
no training-data stage; this belongs to the SURVEY.md "beyond the
reference" pipeline surface, downstream of operators/bpe.py (whose
``segment_with_merges`` produces the (doc_id, tokens) input).

100 TB design
-------------
The classic failure mode for this operator is the global prefix sum: a
``Window.orderBy(doc_id)`` with no partition key moves the whole corpus
into ONE task. Instead ``global_token_offsets`` computes offsets
hierarchically, the standard two-level scan:

- ``repartitionByRange(doc_id)`` + ``sortWithinPartitions`` lays the
  corpus out in corpus order across P partitions (range-partitioner
  sampling keeps them balanced), materialized once with
  ``localCheckpoint`` so the partition layout is FROZEN — every
  downstream job (the per-partition totals read and the final plan)
  sees the identical partitioning instead of re-sampling boundaries;
- ONE bounded driver read of P per-partition token totals, folded into
  per-partition base offsets (P ≈ cores·k rows, never corpus-sized);
- a per-partition running sum (``Window.partitionBy(partition_id)`` —
  P parallel window tasks, each bounded by its partition's rows) added
  to the broadcast base offset.

Chunk assembly then shuffles each document's SLICES to their chunk ids
(``explode(sequence(first_chunk, last_chunk))`` + ``slice`` — pure
JVM-side built-ins; a document overlaps ceil(n/seq_len)+1 chunks at
most, so the fan-out is corpus_tokens/seq_len rows regardless of
document skew) and reassembles each chunk with one map-side-combinable
``collect_list`` keyed on seq_id — chunks have bounded size (seq_len
tokens), so the aggregation state per key is bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tipoca_stream_spark.operators.checkpoint import SPILL_LEVEL


def global_token_offsets(
    seg: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, tokens) → (id, tokens, n_tokens, start): each document's
    starting offset in the concatenated corpus token stream, in ``id_col``
    order. Two-level scan — no corpus-sized single-task window."""
    spark = seg.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        seg.withColumn("n_tokens", F.size(F.col(tokens_col)))
        .repartitionByRange(p, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)  # freeze the sampled range boundaries
    )
    totals = ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("tot")).collect()
    base: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        base[row["_pid"]] = acc
        acc += row["tot"] or 0
    if not base:
        # empty corpus: create_map() with zero entries cannot be analyzed
        # (untyped), and there are no rows for it to serve anyway
        return ranged.withColumn("start", F.lit(0).cast("long")).drop("_pid")
    base_map = F.create_map(
        *[F.lit(x) for kv in sorted(base.items()) for x in kv]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.withColumn(
            "start",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            + base_map[F.col("_pid")],
        )
        .drop("_pid")
    )


def _chunk_pieces(
    seg: DataFrame, seq_len: int, id_col: str, tokens_col: str
) -> DataFrame:
    """(id, tokens) → one row per (chunk, document-slice): the shared
    fan-out both packers build on. Columns: seq_id, _doc (the source
    document id), _gstart (the slice's global offset), _piece (the token
    slice). A document emits ceil(n/seq_len)+1 rows at most."""
    off = global_token_offsets(seg, id_col=id_col, tokens_col=tokens_col)
    lo = F.floor(F.col("start") / seq_len)
    hi = F.floor((F.col("start") + F.col("n_tokens") - 1) / seq_len)
    pieces = (
        off.filter(F.col("n_tokens") > 0)
        .select(
            F.col(id_col).alias("_doc"),
            "start",
            "n_tokens",
            F.col(tokens_col).alias("_toks"),
            F.explode(F.sequence(lo, hi)).alias("seq_id"),
        )
    )
    in_doc_start = F.greatest(
        F.col("seq_id") * seq_len - F.col("start"), F.lit(0)
    )
    in_doc_end = F.least(
        F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len - F.col("start")
    )
    return pieces.select(
        "seq_id",
        "_doc",
        (F.col("start") + in_doc_start).alias("_gstart"),
        F.slice(
            "_toks", (in_doc_start + 1).cast("int"), (in_doc_end - in_doc_start).cast("int")
        ).alias("_piece"),
    )


def pack_sequences(
    seg: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """(id, tokens) → (seq_id, n_tokens, tokens): fixed-length chunks of
    the corpus token stream in ``id_col`` order. Every chunk has
    ``seq_len`` tokens except possibly the last. Deterministic."""
    pieces = _chunk_pieces(seg, seq_len, id_col, tokens_col)
    assembled = pieces.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_gstart"), F.col("_piece")))
                ),
                lambda s: s["_piece"],
            )
        ).alias("tokens")
    )
    return assembled.select(
        "seq_id", F.size("tokens").cast("long").alias("n_tokens"), "tokens"
    )


def pack_sequences_with_spans(
    seg: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """``pack_sequences`` plus per-chunk document-boundary metadata:
    (seq_id, n_tokens, tokens, spans) where spans is an
    array<struct<doc_id, start, len>> ordered by in-chunk position —
    the block-diagonal attention-mask input ("sample packing": each
    span attends only within itself, so the trainer needs to know where
    documents begin and end inside every packed sequence).

    Same plan as ``pack_sequences`` — the span metadata rides the slice
    rows the chunk shuffle already carries, so the only addition is a
    constant-width struct per (chunk, document) pair; no extra shuffle,
    no extra pass."""
    pieces = _chunk_pieces(seg, seq_len, id_col, tokens_col)
    assembled = pieces.groupBy("seq_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_gstart"), F.col("_doc"), F.col("_piece")))
        ).alias("_sorted")
    )
    spans = F.transform(
        F.col("_sorted"),
        lambda s: F.struct(
            s["_doc"].alias("doc_id"),
            (s["_gstart"] - F.col("seq_id") * seq_len).alias("start"),
            F.size(s["_piece"]).cast("long").alias("len"),
        ),
    )
    return assembled.select(
        "seq_id",
        F.flatten(F.transform(F.col("_sorted"), lambda s: s["_piece"])).alias(
            "tokens"
        ),
        spans.alias("spans"),
    ).select(
        "seq_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
        "spans",
    )


def harmonic_pack(
    lengths: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    len_col: str = "n_eff",
    num_partitions: int | None = None,
) -> DataFrame:
    """Capacity-aware WHOLE-document bin packing (no splitting — the
    "fewer truncations" layout, vs ``pack_sequences``' concatenate-and-cut).
    Harmonic size-class shelf scheme (Lee & Lee, JACM 1985): a document of
    effective length n (0 < n ≤ capacity) gets class
    ``cls = floor(capacity / n)`` — by construction ``cls`` docs of that
    class fit in one bin (each n ≤ capacity/cls) — then docs are ranked
    within their class by (n desc, id asc) and dealt into bins of exactly
    ``cls`` docs: ``bin_idx = (rank-1) // cls``. Deterministic, and every
    non-final bin of class k is filled past capacity·k/(k+1) (each member
    is > capacity/(k+1)), so padding waste is bounded below 1/(k+1) of the
    bin except on the ≤ one partial shelf per class.

    100 TB design: the naive plan is one global window per class — but a
    hot class (tiny documents) can hold most of the corpus, which makes
    ``Window.partitionBy(cls)`` a single-task sort. Ranks are computed
    hierarchically instead, the ``global_token_offsets`` two-level-scan
    shape: range-partition by the total order (cls, n desc, id), ONE
    bounded driver read of per-(partition, class) row counts — bounded by
    P × |classes|, and ``floor(capacity/n)`` takes O(√capacity) distinct
    values (the divisor trick), never corpus-sized — then a per-partition
    row_number plus the broadcast base rank.

    Input: (id_col, len_col) with 0 < len ≤ capacity (caller truncates or
    pre-chunks longer docs). Output: input columns + cls, bin_idx,
    pos_in_bin (0-based rank inside the bin).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    spark = lengths.sparkSession
    p = num_partitions or spark.sparkContext.defaultParallelism
    n = F.col(len_col)
    # contract guard (ADVICE r8): a row with n > capacity would get
    # cls = 0 and `div cls` / `% cls` would yield NULL bin_idx/pos_in_bin
    # SILENTLY. Enforce 0 < n ≤ capacity in the classing expression itself
    # — raise_error fires executor-side on first violation, no extra
    # validation pass over the corpus.
    n_ok = F.when(
        (n.isNull()) | (n <= 0) | (n > capacity),
        F.raise_error(
            F.concat(
                F.lit(
                    f"harmonic_pack: {len_col} outside contract (0, {capacity}]: "
                ),
                n.cast("string"),
            )
        ).cast("long"),
    ).otherwise(n)
    classed = lengths.withColumn("cls", F.floor(F.lit(capacity) / n_ok))
    ranged = (
        classed.repartitionByRange(
            p, F.col("cls"), n.desc(), F.col(id_col)
        )
        .sortWithinPartitions(F.col("cls"), n.desc(), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True, storageLevel=SPILL_LEVEL)  # freeze the sampled range boundaries
    )
    counts = (
        ranged.groupBy("_pid", "cls").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    # base rank for (pid, cls) = rows of the same class in lower pids
    # (range partitioner assigns ascending (cls, n desc, id) ranges to
    # ascending pids, so lower pid ⇒ earlier in the class's total order)
    per_cls: dict[int, list[tuple[int, int]]] = {}
    for row in counts:
        per_cls.setdefault(row["cls"], []).append((row["_pid"], row["c"]))
    base: dict[tuple[int, int], int] = {}
    for cls, pairs in per_cls.items():
        acc = 0
        for pid, c in sorted(pairs):
            base[(pid, cls)] = acc
            acc += c
    w = Window.partitionBy("_pid", "cls").orderBy(n.desc(), F.col(id_col))
    ranked = ranged.withColumn("_rn", F.row_number().over(w))
    if base:
        base_map = F.create_map(
            *[
                x
                for (pid, cls), b in sorted(base.items())
                for x in (F.concat_ws(":", F.lit(pid), F.lit(cls)), F.lit(b))
            ]
        )
        rank = (
            base_map[F.concat_ws(":", F.col("_pid"), F.col("cls"))] + F.col("_rn")
        )
    else:
        # empty input: zero-entry create_map cannot be analyzed (untyped)
        rank = F.col("_rn").cast("long")
    return (
        ranked.withColumn("_r0", (rank - 1).cast("long"))
        .select(
            *[F.col(c) for c in lengths.columns],
            "cls",
            F.expr("_r0 div cls").cast("long").alias("bin_idx"),
            (F.col("_r0") % F.col("cls")).cast("long").alias("pos_in_bin"),
        )
    )
