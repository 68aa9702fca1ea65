"""MaintainedIndexBase (round 13, VERDICT r12 next #4): the shared
contract of the three maintained indexes, tested ONCE at the base —

- ``_merged_metadata`` preserves FOREIGN metadata keys (e.g. a streaming
  wrapper's epoch guard) across every index-owned commit while the
  index's own keys overwrite;
- each concrete operator routes its ingest commit through the contract,
  so a foreign key planted on the index survives a later ingest by any
  family (the round-12 semantic fix, promoted to all three);
- the three streaming wrappers' epoch guards are themselves built
  through the contract, so a guard commit can no longer erase foreign
  keys wholesale (ADVICE r12 #2);
- the zero-committed-epochs ``matches()`` schema comes from the config
  (ADVICE r12 #1) and matches the logged-parquet schema.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _fp(bits_on):
    return "".join("1" if i in bits_on else "0" for i in range(64))


def _fp_df(spark, rows):
    return spark.createDataFrame(rows, ["media_id", "phash"]).withColumn(
        "media_id", F.col("media_id").cast("long")
    )


def test_merged_metadata_preserves_foreign_keys(spark, tmp_path):
    from tipoca_stream_spark.operators.incremental_fingerprint import (
        IncrementalFingerprintIndex,
    )

    idx = IncrementalFingerprintIndex(spark, str(tmp_path))
    idx.ingest(_fp_df(spark, [(1, _fp([0, 1]))]), dedup=False)
    base = idx.index.current_version()
    # plant a foreign key (as a streaming wrapper's guard would)
    idx.index.append_delta(
        idx._band_rows(_fp_df(spark, [(2, _fp([10, 11]))])),
        metadata=idx._merged_metadata(base, {"foreign_marker": [7]}),
        expected_base=base,
    )
    assert idx.index.read_metadata()["foreign_marker"] == [7]
    # the index's own next commit (explicit own keys) must carry it
    base2 = idx.index.current_version()
    idx.ingest(
        _fp_df(spark, [(3, _fp([20, 21]))]),
        dedup=False,
        metadata={"own_key": 1},
    )
    meta = idx.index.read_metadata()
    assert meta["foreign_marker"] == [7], meta
    assert meta["own_key"] == 1, meta
    assert idx.index.current_version() == base2 + 1
    # and a metadata=None ingest (append_delta's carry-forward path) too
    idx.ingest(_fp_df(spark, [(4, _fp([30, 31]))]), dedup=False)
    assert idx.index.read_metadata()["foreign_marker"] == [7]


def test_minhash_ingest_preserves_foreign_keys(spark, tmp_path):
    from tipoca_stream_spark.operators.incremental_dedup import IncrementalDeduper

    d = IncrementalDeduper(spark, str(tmp_path))
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta"),
         ("b", "one two three four five six seven")],
        ["doc_id", "text"],
    )
    d.ingest(docs)
    base = d.index.current_version()
    d.index.append_delta(
        d._band_rows(
            d._signatures(
                spark.createDataFrame(
                    [("c", "red orange yellow green blue indigo")],
                    ["doc_id", "text"],
                ),
                "text",
                "doc_id",
            ),
            "doc_id",
        ),
        metadata=d._merged_metadata(base, {"foreign_marker": "keep"}),
        expected_base=base,
    )
    # a later plain ingest must not erase the foreign key
    d.ingest(
        spark.createDataFrame(
            [("d", "lorem ipsum dolor sit amet consectetur")], ["doc_id", "text"]
        )
    )
    assert d.index.read_metadata()["foreign_marker"] == "keep"


def test_semantic_ingest_preserves_foreign_keys(spark, tmp_path):
    from tipoca_stream_spark.operators.incremental_semantic import (
        IncrementalSemanticDeduper,
    )

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "seed_id long, seed_vec array<double>"
    )
    d = IncrementalSemanticDeduper(spark, str(tmp_path), seeds=seeds)
    vecs = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    d.ingest(vecs)
    base = d.index.current_version()
    d.index.append_delta(
        d._assigned(
            spark.createDataFrame(
                [(12, [0.8, 0.3])], "vec_id long, embedding array<double>"
            ),
            d.seeds_at(base),
            d._mode_at(base),
        ).select("vec_id", "cluster_id", "embedding"),
        metadata=d._merged_metadata(base, {"foreign_marker": 42}),
        expected_base=base,
    )
    d.ingest(
        spark.createDataFrame(
            [(13, [0.2, 0.95])], "vec_id long, embedding array<double>"
        )
    )
    meta = d.index.read_metadata()
    assert meta["foreign_marker"] == 42, meta
    # the index's own keys still ride every commit
    assert "seeds_version" in meta and "n_rows" in meta


def test_streaming_empty_matches_schema_follows_config(spark, tmp_path):
    """ADVICE r12 #1: with zero committed epochs, matches() must return
    the CONFIGURED id type, not a hardcoded one."""
    from tipoca_stream_spark.streaming.corpus_dedup_ingest import (
        CorpusDedupIngestConfig,
        CorpusDedupIngestPipeline,
    )
    from tipoca_stream_spark.streaming.multimodal_ingest import (
        MultimodalIngestConfig,
        MultimodalIngestPipeline,
    )

    mm = MultimodalIngestPipeline(
        spark,
        MultimodalIngestConfig(
            root=str(tmp_path / "mm"),
            checkpoint_dir=str(tmp_path / "mm_ck"),
            id_type="string",
        ),
    )
    assert dict(mm.matches().dtypes)["member_id"] == "string"
    cd = CorpusDedupIngestPipeline(
        spark,
        CorpusDedupIngestConfig(
            root=str(tmp_path / "cd"),
            checkpoint_dir=str(tmp_path / "cd_ck"),
            id_type="bigint",
        ),
    )
    dt = dict(cd.matches().dtypes)
    assert dt["new_id"] == "bigint" and dt["corpus_id"] == "bigint"


def test_streaming_guard_preserves_foreign_metadata(spark, tmp_path):
    """ADVICE r12 #2: a streaming wrapper's epoch-guard commit must
    merge over the index's current metadata, not replace it wholesale."""
    from tipoca_stream_spark.streaming.multimodal_ingest import (
        MultimodalIngestConfig,
        MultimodalIngestPipeline,
    )

    pipe = MultimodalIngestPipeline(
        spark,
        MultimodalIngestConfig(
            root=str(tmp_path / "idx"),
            checkpoint_dir=str(tmp_path / "ck"),
            fingerprinter=lambda docs: docs.select("media_id", "phash"),
        ),
    )
    pipe.run_batch(_fp_df(spark, [(1, _fp([0, 1]))]), epoch_id=0)
    # plant a foreign key on the index between epochs
    idx = pipe.index.index
    base = idx.current_version()
    idx.append_delta(
        pipe.index._band_rows(_fp_df(spark, [(50, _fp([40, 41]))])),
        metadata=pipe.index._merged_metadata(base, {"other_owner": "x"}),
        expected_base=base,
    )
    pipe.run_batch(_fp_df(spark, [(2, _fp([20, 21]))]), epoch_id=1)
    meta = idx.read_metadata()
    assert meta["other_owner"] == "x", meta
    assert set(meta["ingested_epochs"]) == {0, 1}, meta
