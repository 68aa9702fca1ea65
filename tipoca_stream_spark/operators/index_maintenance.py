"""Automatic maintenance for the incremental dedup indexes: compaction
and re-quantization wired INTO the ingest loop (VERDICT r8 next #1).

Round 8 built the primitives — ``BucketedTargetTable.compact()`` folds an
append chain, ``IncrementalSemanticDeduper.maybe_requantize()`` grows the
quantizer with corpus density — but both were caller hooks: nothing in the
steady state invoked them, so a pipeline that only ever called ``ingest``
would accumulate one file per bucket per batch forever (screens schedule
O(chain) files per touched bucket) and, on the semantic side, let cluster
density drift back into the frozen-k regime the round-7 probe measured at
19× cost per 10× data. The reference performs its maintenance *inside*
every batch cycle — the loader dedupes and merges as part of processing
each batch (pkg/redshiftloader/load_processor.go:386-444), it does not
export a "please merge now" hook — so the index tier states its cadence
the same way: a policy object the deduper consults after every commit.

``IndexMaintenancePolicy`` triggers two actions, both bounded and both
riding the table's CAS:

- **bucket-scoped compaction** when any bucket's append chain exceeds
  ``compact_files_per_bucket`` files: ONLY the over-chained buckets are
  read back and rewritten (one file each) via ``write_bucket_delta``;
  every other bucket's files hard-link forward. Cost is O(rows of the
  long-chain buckets), never O(corpus) — at 100 TB a full-table
  ``compact()`` per trigger would be the same O(corpus)-per-batch tax
  the r7 ingest paid, just amortized. Because ``append_delta`` touches
  only the batch's buckets, chains grow ∝ how often a bucket is touched,
  and the trigger fires on the hot buckets first.
- **density-triggered requantize** (semantic index only) through the
  deduper's own ``maybe_requantize``: k grows with n so the per-cluster
  candidate join stays constant-density (the only regime the scale probes
  show linear). Requantize IS a full rewrite — Strategy-3 rebuild under
  one CAS flip — which is why it runs on a density threshold (amortized
  over the growth that caused it), not per batch.

A maintenance action losing its CAS race (a concurrent ingest committed
first) is recorded and SKIPPED, never retried inline: the ingest that
triggered it already committed, the index is merely un-maintained, and
the next batch's policy check re-evaluates against the new head. One
winner per version, losers converge — the same T8 story as the data
plane, now including maintenance-vs-ingest races.

Optional ``vacuum_keep`` bounds version history (time-travel depth) in
the same pass, completing the janitor loop: without it a long soak keeps
every historical version's files pinned via their hard-links.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from tipoca_stream_spark.sources.target import (
    BucketedTargetTable,
    ConcurrentWriteError,
)


@dataclass
class IndexMaintenancePolicy:
    """Consulted by ``IncrementalDeduper.ingest`` /
    ``IncrementalSemanticDeduper.ingest`` after every successful commit.

    ``compact_files_per_bucket``: compact any bucket whose append chain
    exceeds this many files (0/None disables). ``target_per_cluster``:
    mean-density threshold forwarded to the semantic deduper's
    ``maybe_requantize`` (None disables; ignored by the MinHash index,
    which has no quantizer). ``vacuum_keep``: retain this many committed
    versions after maintenance (None disables vacuuming).

    ``history`` holds one record per consultation — the soak's evidence
    trail (what fired, chain lengths, races lost) without any extra
    measurement pass.
    """

    compact_files_per_bucket: int | None = 8
    target_per_cluster: int | None = None
    # requantize with k-means-trained centroids (grown_seeds(trained=True))
    # instead of the smallest-id quantizer — what a production pipeline
    # ships; both are deterministic (k-means init is the smallest-id set)
    requantize_trained: bool = False
    # over-grow k by this factor on each requantize so the post-rebuild
    # density sits at target/slack, not exactly at the trigger: slack=1
    # re-trips the O(corpus) rebuild on EVERY batch of a steadily-growing
    # corpus; slack=2 needs a corpus doubling between rebuilds (amortized
    # O(log growth) requantizes — the doubling-array argument)
    requantize_slack: float = 2.0
    # flip the semantic index's assignment rule flat → two_level when a
    # requantize grows k past this (VERDICT r9 next #1): flat assignment
    # is linear in k and the policy grows k ∝ corpus, so past the
    # measured crossover (~10³, SCALE_PROBE_r09_assignment.json) the
    # screen pays an avoidable linear-in-k tax unless the operator is
    # reconfigured by hand. The flip rides the requantize commit — the
    # rule migrates with the seeds in one CAS, exactly like the loader
    # picking its merge strategy per batch from batch shape
    # (pkg/redshiftloader/load_processor.go:774-781). None disables
    # (keep the deduper's configured mode forever).
    two_level_k_threshold: int | None = 1024
    vacuum_keep: int | None = None
    history: list[dict] = field(default_factory=list)

    # --- observations ----------------------------------------------------

    def chain_lengths(self, index: BucketedTargetTable) -> dict[int, int]:
        """files-per-bucket of the current version — pure directory
        metadata (O(files) driver-side listing, no data read)."""
        v = index.current_version()
        if v is None:
            return {}
        return {b: len(fs) for b, fs in index._bucket_files(v).items()}

    # --- the per-batch hook ----------------------------------------------

    def after_ingest(self, index: BucketedTargetTable, requantizer=None) -> dict:
        """Run whatever maintenance is due on ``index``; returns (and
        appends to ``history``) a record of what happened. ``requantizer``
        is the owning semantic deduper (anything with
        ``maybe_requantize(target_per_cluster)``) — the MinHash deduper
        passes None.

        Order matters: requantize first (it is a full rewrite, which
        resets every chain to one file and makes a triggered compaction
        moot), then chain-scoped compaction, then vacuum (so the versions
        maintenance itself created are subject to the same retention)."""
        rec: dict = {"requantized": None, "compacted_buckets": [], "lost_race": []}
        if requantizer is not None and self.target_per_cluster:
            try:
                rec["requantized"] = requantizer.maybe_requantize(
                    self.target_per_cluster,
                    trained=self.requantize_trained,
                    slack=self.requantize_slack,
                    two_level_k_threshold=self.two_level_k_threshold,
                )
                if rec["requantized"] is not None:
                    # the soak's evidence trail records WHICH rule the
                    # rebuild committed under (the flip shows up here)
                    rec["assign_mode"] = requantizer.assign_mode
            except ConcurrentWriteError:
                rec["lost_race"].append("requantize")
        if self.compact_files_per_bucket:
            chains = self.chain_lengths(index)
            rec["max_chain"] = max(chains.values(), default=0)
            over = sorted(
                b for b, n in chains.items() if n > self.compact_files_per_bucket
            )
            if over:
                base = index.current_version()
                try:
                    index.write_bucket_delta(
                        index.read_buckets(over, version=base),
                        over,
                        expected_base=base,
                    )
                    rec["compacted_buckets"] = over
                except ConcurrentWriteError:
                    rec["lost_race"].append("compact")
        if self.vacuum_keep is not None:
            # retention floor: the ingest that invoked us screened against
            # the version BEFORE its append (base = head − 1 − the commits
            # maintenance just made), and its returned flagged/pairs frames
            # lazily read base's FILES — vacuuming base in the same call
            # would break a caller that collects them after ingest returns.
            # keep ≥ 2 + maintenance commits retains base through this call;
            # the next call's vacuum reclaims it.
            created = int(rec["requantized"] is not None) + int(
                bool(rec["compacted_buckets"])
            )
            rec["vacuumed"] = index.vacuum(keep=max(self.vacuum_keep, 2 + created))
        self.history.append(rec)
        return rec
