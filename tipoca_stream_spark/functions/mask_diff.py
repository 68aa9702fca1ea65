"""Mask-config diff → reload set (SURVEY.md §2.12 O5).

Port of the reference's two-layer diff:

- ``modified_tables`` = ``pkg/transformer/masker/mask_diff.go:16-113``
  (MaskDiffer.Diff): per rule-type, iterate the DESIRED config's sparse
  {table → rules} map and flag a table when it is new or its rules for
  that type changed. Deliberately asymmetric, as in the reference: a table
  (or a whole rule section) present only in CURRENT is not flagged — a
  rule removal with no desired-side entry triggers no reload.
- ``mask_reload_plan`` = ``controllers/mask_diff.go:16-128`` (MaskDiff):
  shrink the topic list by the desired config's include_tables, diff, drop
  modified tables outside include_tables, and map the surviving tables
  back to their topics. The git-fetch and sync.Map caches of the operator
  collapse away — configs arrive as loaded MaskConfig objects here.

Divergence, documented: rule values compare AFTER TableMaskRules'
lowercasing normalization, so a case-only rename is NOT a modification
(the compiled mask plan is identical, hence no reload is needed); the
reference DeepEquals raw YAML values and would reload.
"""

from __future__ import annotations

from dataclasses import dataclass

from tipoca_stream_spark.functions.masking import MaskConfig, TableMaskRules

# the nine rule maps diffed by mask_diff.go:97-112, in the same order
RULE_FIELDS = [
    "non_pii_keys",
    "length_keys",
    "mobile_keys",
    "mapping_pii_keys",
    "sort_keys",
    "dist_keys",
    "conditional_non_pii_keys",
    "dependent_non_pii_keys",
    "regex_pattern_boolean_keys",
]


def _sparse(cfg: MaskConfig, rule: str) -> dict[str, object]:
    """{table → non-empty rule value}: the reference's per-rule-type map
    shape (a table with no entry for a rule type is absent, not empty)."""
    out = {}
    for table, rules in cfg.tables.items():
        val = getattr(rules, rule)
        if val:
            out[table] = val
    return out


def modified_tables(current: MaskConfig, desired: MaskConfig) -> set[str]:
    """Tables whose mask rules changed between two configs
    (mask_diff.go:90-113: Diff over all nine rule maps)."""
    modified: set[str] = set()
    for rule in RULE_FIELDS:
        cur, des = _sparse(current, rule), _sparse(desired, rule)
        if cur == des:
            continue
        for table, d_val in des.items():  # desired-side iteration only
            if table in modified:
                continue
            if table not in cur or cur[table] != d_val:
                modified.add(table)
    return modified


def parse_topic(topic: str) -> tuple[str, str, str]:
    """``db.server.table`` → parts (transformer.go:43-46)."""
    db, server, table = topic.split(".", 2)
    return db, server, table


@dataclass
class MaskReloadPlan:
    modified_topics: list[str]  # topics that must reload
    topics: list[str]  # full topic list after include_tables shrink
    include_tables: list[str]


def mask_reload_plan(
    topics: list[str],
    desired: MaskConfig,
    current: MaskConfig | None = None,
) -> MaskReloadPlan:
    """controllers/mask_diff.go:16-128: which topics must reload for a mask
    config move from ``current`` to ``desired``. ``current=None`` is the
    first deployment — every (included) topic reloads
    (mask_diff.go:81-83)."""
    include = desired.include_tables
    if include is not None:
        included = set(include)
        topics = [t for t in topics if parse_topic(t)[2].lower() in included]
    if current is None:
        return MaskReloadPlan(list(topics), list(topics), list(include or []))

    tables = modified_tables(current, desired)
    if include is not None:
        tables = {t for t in tables if t in set(include)}  # mask_diff.go:96-107
    modified = [t for t in topics if parse_topic(t)[2].lower() in tables]
    return MaskReloadPlan(modified, list(topics), list(include or []))


def reference_yaml_to_tables(doc: dict) -> dict[str, TableMaskRules]:
    """Pivot the reference's YAML layout (rule-type → table → rules,
    masker/database.yaml) into per-table TableMaskRules."""
    per_table: dict[str, dict] = {}
    for rule in RULE_FIELDS + ["include_tables"]:
        section = doc.get(rule)
        if rule == "include_tables" or not isinstance(section, dict):
            continue
        for table, val in section.items():
            per_table.setdefault(table.lower(), {})[rule] = val
    return {t: TableMaskRules(**kw) for t, kw in per_table.items()}


def load_reference_mask_config(path: str, salt: str, algo: str = "sha1") -> MaskConfig:
    """Load a mask config written in the reference's YAML layout
    (mask_config.go:24-60 struct tags)."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    return MaskConfig(
        salt=salt,
        algo=algo,
        tables=reference_yaml_to_tables(doc),
        include_tables=doc.get("include_tables"),
    )
