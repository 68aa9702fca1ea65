"""Operating-point sweep for the ANN ladder (VERDICT r5 worklist #6):
recall@10 vs wall-clock across IVF nprobe and PQ (M, K) — the table a
user tuning the index actually needs, generated from the same engine
code the registered queries run.

Sweeps, on the embeddings table at $SPARK_GRAFT_SF_DIR:

- **IVF** (kmeans-trained coarse quantizer, 16 cells): nprobe ∈
  {1, 2, 4, 8, 16} — candidates confined to each query's nprobe nearest
  cells, exact cosine re-rank inside, recall vs brute-force cosine
  top-10. nprobe=16 scans every cell, so its recall must be 1.0 (a
  built-in self-check of the harness).
- **PQ** (per-subspace codebooks k-means-TRAINED on a bounded driver
  sample, ADC scoring): (M, K) ∈ {(4,8), (8,8), (4,16), (8,16), (16,16)}
  — recall vs exact-L2 top-10. The ADC join shape is the scale path: a
  broadcast (qid, m, code) → LUT join + sum, never a per-row Python step.

Prints one JSON line per operating point plus a markdown table on
stderr-free stdout; timings are min-of-2 on the query phase (encode /
assign cost reported separately — it amortizes over every query).

Usage: python scripts/ann_operating_points.py [--sf-dir DIR] [--queries N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def brute_cosine_gt(emb: DataFrame, qids: list[int], k: int) -> dict[int, set]:
    from tipoca_stream_spark.operators.similarity import cosine_batch_topk

    rows = cosine_batch_topk(emb, qids, k).collect()
    gt: dict[int, set] = {q: set() for q in qids}
    for r in rows:
        gt[r["qid"]].add(r["vec_id"])
    return gt


def brute_l2_gt(emb: DataFrame, qids: list[int], k: int) -> dict[int, set]:
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("_q")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("_q"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(d2, 6).alias("d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("vec_id"))
    rows = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).collect()
    gt: dict[int, set] = {}
    for r in rows:
        gt.setdefault(r["qid"], set()).add(r["vec_id"])
    return gt


def recall(top: dict[int, set], gt: dict[int, set]) -> float:
    num = sum(len(top.get(q, set()) & gt[q]) for q in gt)
    den = sum(len(gt[q]) for q in gt)
    return round(num / den, 4)


def timed_topk(fn, reps: int = 2):
    """min-of-reps wall clock around a collect-returning thunk."""
    best, rows = None, None
    for _ in range(reps):
        t0 = time.monotonic()
        rows = fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return rows, round(best, 3)


def ivf_sweep(spark, emb: DataFrame, qids: list[int], gt: dict[int, set], k: int):
    from tipoca_stream_spark.operators.kmeans import assign_to_centroids, kmeans_train

    t0 = time.monotonic()
    # 3 Lloyd iterations: the centroid set stabilizes enough for a
    # recall-vs-nprobe comparison (what this sweep measures) and each
    # 16-centroid iteration is expression-heavy — training quality is
    # plans/clustering's concern, not this harness's
    cents = kmeans_train(emb, k=16, n_iter=3)
    assign = assign_to_centroids(emb, cents).select("vec_id", "embedding", "centroid_id")
    assign = assign.persist()
    assign.count()
    build_s = round(time.monotonic() - t0, 3)

    # per-query cell ranking: Q × 16 distances, driver-side (bounded)
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    def cells_ranked(qv):
        ds = [
            (sum((a - b) ** 2 for a, b in zip(qv, c)), i) for i, c in enumerate(cents)
        ]
        return [i for _, i in sorted(ds)]

    ranked = {q: cells_ranked(v) for q, v in qvecs.items()}
    out = []
    for nprobe in (1, 2, 4, 8, 16):
        probe = spark.createDataFrame(
            [(q, c) for q in qids for c in ranked[q][:nprobe]], "qid long, centroid_id int"
        )
        q = emb.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("_q")
        )

        def run():
            from tipoca_stream_spark.operators.similarity import cosine

            cand = assign.join(F.broadcast(probe), "centroid_id")
            scored = (
                cand.join(F.broadcast(q), "qid")
                .filter(F.col("vec_id") != F.col("qid"))
                .select(
                    "qid", "vec_id",
                    F.round(cosine(F.col("embedding"), F.col("_q")), 6).alias("sim"),
                )
            )
            w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .collect()
            )

        rows, secs = timed_topk(run)
        print(f"[ann] ivf nprobe={nprobe} done ({secs}s)", file=sys.stderr, flush=True)
        top: dict[int, set] = {}
        for r in rows:
            top.setdefault(r["qid"], set()).add(r["vec_id"])
        out.append(
            {
                "family": "ivf", "point": f"nprobe={nprobe}",
                "recall_at_10": recall(top, gt), "query_sec": secs,
                "build_sec": build_s,
            }
        )
    assign.unpersist()
    return out


def pq_codebooks(
    sample, m: int, k: int, dim: int, iters: int = 10
) -> list[list[list[float]]]:
    """Per-subspace k-means-trained codebooks on a bounded driver-side
    sample — the standard PQ practice (at 100 TB you train on ~10^5
    SAMPLED vectors and broadcast the M·K·sub floats; training never
    touches the full corpus). plans/pq.py's registered queries use fixed
    gaussian codebooks because their contract is the oracle-checked
    encode/ADC arithmetic, not retrieval quality; an OPERATING-POINT
    table is about quality, and untrained codebooks measure noise
    (recall ≈ 0.01 observed) — so the sweep trains. Deterministic init
    (first k sample subvectors), ties to the lowest code."""
    import numpy as np

    sub = dim // m
    books = []
    for mi in range(m):
        S = sample[:, mi * sub : (mi + 1) * sub]
        C = S[:k].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(axis=1)
            for j in range(k):
                pts = S[a == j]
                if len(pts):
                    C[j] = pts.mean(axis=0)
        books.append(C.tolist())
    return books


def pq_encode(emb: DataFrame, books, dim: int) -> DataFrame:
    """(vec_id, m, code): per-subspace nearest codeword, as an
    Arrow-batched numpy argmin (`mapInPandas`).

    The registered PQ queries (plans/pq.py) pin an expression-only encode
    at the production operating point (M=4, K=8) — right for the oracle
    contract and plan-shape tests. A SWEEP has to evaluate M·K up to 256
    codeword distances per row, and the expression encoding of that
    (`aggregate(zip_with(...))` × 256, argmin chains) blows the 64 KB
    whole-stage-codegen method limit into the interpreted path and then
    the heap (observed at (4,16) on 2000×64 vectors). One vectorized
    einsum-style batch per Arrow chunk is the honest scale path for a
    tuning tool: O(n·dim·K) flops, constant plan size, ties broken to the
    lowest code exactly like the expression argmin's strict-< chain."""
    import numpy as np
    import pandas as pd

    m_n = len(books)
    sub = dim // m_n
    B = [np.asarray(books[m], dtype=np.float64) for m in range(m_n)]  # K×sub

    def enc(batches):
        for pdf in batches:
            V = np.array(pdf["embedding"].tolist(), dtype=np.float64)  # n×dim
            outs = []
            for m in range(m_n):
                S = V[:, m * sub : (m + 1) * sub]
                d = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(-1)  # n×K
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "m": np.full(len(pdf), m, dtype=np.int32),
                            "code": d.argmin(axis=1).astype(np.int32),
                        }
                    )
                )
            yield pd.concat(outs)

    return emb.mapInPandas(enc, "vec_id long, m int, code int")


def pq_sweep(spark, emb: DataFrame, qids: list[int], gt: dict[int, set], k: int, dim: int):
    import numpy as np

    out = []
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    # bounded training sample: deterministic id-range, never corpus-scale
    sample = np.array(
        [
            [float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") < 20000).collect()
        ],
        dtype=np.float64,
    )
    for m_n, k_n in ((4, 8), (8, 8), (4, 16), (8, 16), (16, 16)):
        t_train = time.monotonic()
        books = pq_codebooks(sample, m_n, k_n, dim)
        train_s = round(time.monotonic() - t_train, 3)
        sub = dim // m_n
        t0 = time.monotonic()
        codes = pq_encode(emb, books, dim).persist()
        codes.count()
        build_s = round(time.monotonic() - t0, 3)
        print(f"[ann] pq M={m_n} K={k_n} encoded ({build_s}s)", file=sys.stderr, flush=True)
        # ADC LUT: (qid, m, code) -> partial d2, driver-built (Q × M × K)
        lut_rows = []
        for qid, qv in qvecs.items():
            for m in range(m_n):
                qs = qv[m * sub : (m + 1) * sub]
                for code in range(k_n):
                    d = sum((a - b) ** 2 for a, b in zip(qs, books[m][code]))
                    lut_rows.append((qid, m, code, float(d)))
        lut = spark.createDataFrame(lut_rows, "qid long, m int, code int, pd double")

        # the production query shape: ADC candidate generation (top-100)
        # + exact re-rank of the candidates. The timed query is the ADC
        # top-100; the re-rank is a bounded (<= Q·100) exact pass — at
        # scale a join against the candidates, here computed directly.
        n_cand = 100

        def run():
            scored = (
                codes.join(F.broadcast(lut), ["m", "code"])
                .filter(F.col("vec_id") != F.col("qid"))
                .groupBy("qid", "vec_id")
                .agg(F.round(F.sum("pd"), 6).alias("ad2"))
            )
            w = Window.partitionBy("qid").orderBy(F.asc("ad2"), F.asc("vec_id"))
            return (
                scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= n_cand)
                .collect()
            )

        rows, secs = timed_topk(run)
        top: dict[int, set] = {}
        cand: dict[int, list] = {}
        for r in rows:
            cand.setdefault(r["qid"], []).append(r["vec_id"])
            if r["rn"] <= k:
                top.setdefault(r["qid"], set()).add(r["vec_id"])
        cand_ids = sorted({v for vs in cand.values() for v in vs})
        cvecs = {
            r["vec_id"]: np.array([float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id").isin(cand_ids)).collect()
        }
        rerank: dict[int, set] = {}
        for qid, vids in cand.items():
            qv = np.array(qvecs[qid])
            exact = sorted((float(((cvecs[v] - qv) ** 2).sum()), v) for v in vids)
            rerank[qid] = {v for _, v in exact[:k]}
        out.append(
            {
                "family": "pq", "point": f"M={m_n},K={k_n}",
                "recall_at_10": recall(top, gt), "query_sec": secs,
                "rerank100_recall_at_10": recall(rerank, gt),
                "build_sec": build_s, "train_sec": train_s,
                "bits_per_vec": m_n * (k_n - 1).bit_length(),
            }
        )
        codes.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", type=int, default=20)
    args = ap.parse_args()

    from tipoca_stream_spark.plans.training import _embs
    from tipoca_stream_spark.session import get_spark

    spark = get_spark("ann_operating_points")
    emb = _embs(spark, args.sf_dir).select("vec_id", "embedding").persist()
    n = emb.count()
    dim = len(emb.limit(1).collect()[0]["embedding"])
    qids = list(range(args.queries))

    print(f"[ann] corpus n={n} dim={dim}", file=sys.stderr, flush=True)
    gt_cos = brute_cosine_gt(emb, qids, 10)
    print("[ann] cosine ground truth done", file=sys.stderr, flush=True)
    gt_l2 = brute_l2_gt(emb, qids, 10)
    print("[ann] l2 ground truth done", file=sys.stderr, flush=True)

    results = ivf_sweep(spark, emb, qids, gt_cos, 10) + pq_sweep(
        spark, emb, qids, gt_l2, 10, dim
    )
    meta = {"sf_dir": args.sf_dir, "n_vectors": n, "dim": dim, "n_queries": len(qids)}
    for r in results:
        print(json.dumps({**meta, **r}))

    print("\n| family | point | recall@10 | rerank100 recall@10 | query s | build s |")
    print("|---|---|---|---|---|---|")
    for r in results:
        rr = r.get("rerank100_recall_at_10")
        rr_s = f"{rr:.3f}" if rr is not None else "—"
        print(
            f"| {r['family']} | {r['point']} | {r['recall_at_10']:.3f} | {rr_s} "
            f"| {r['query_sec']:.3f} | {r['build_sec']:.3f} |"
        )
    # harness self-check: scanning every cell must be exact
    full = [r for r in results if r["point"] == "nprobe=16"]
    assert full and full[0]["recall_at_10"] == 1.0, "nprobe=all must be exact"


if __name__ == "__main__":
    main()
