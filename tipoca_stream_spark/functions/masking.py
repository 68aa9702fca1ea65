"""PII-masking / column-derivation suite, compiled to Column expressions.

Re-expresses the reference masker (``pkg/transformer/masker/masker.go``,
``mask_config.go``; semantics doc ``MASKING.md:1-121``) as a pure
config→Column planner. Policy (masker.go:61-67): **mask everything** with a
salted hash unless a rule unmasks it. No Python UDFs anywhere — every rule
becomes a Catalyst expression, so at 100 TB this is embarrassingly parallel
map work inside whole-stage codegen.

Rule inventory (SURVEY.md §2.2):

- P5  default mask           → ``sha1(concat(col, salt))``
- P6  non_pii_keys           → exact allow-list, skip hashing
- P7  conditional_non_pii    → unmask when value matches a SQL-LIKE pattern
                               (``%``→``.*``, anchored, case-sensitive —
                               mask_config.go:413-463)
- P8  dependent_non_pii      → unmask col A when provider col B ∈ values
                               (mask_config.go:465-516)
- P9  length_keys            → extra ``<c>_length`` int, default 0
                               (masker.go:99-111)
- P10 mobile_keys            → extra ``<c>_init5`` = first 5 chars
                               (masker.go:112-132)
- P11 mapping_pii_keys       → extra ``hashed_<c>`` = hash, original kept
                               clear; presence unmasks the whole table
                               (masker.go:133-146,159-162)
- P12 regex_pattern_boolean_keys → extra bool ``<c>_<name>`` =
                               case-insensitive regex match
                               (mask_config.go:322-375)
- P14 null/empty normalization → whitespace-only → NULL (masker.go:164-166)
- P15 missing-column backfill → schema cols absent in input added as NULL
                               (masker.go:51-59)
- P16 case normalization     → all column names lowercased
                               (schema.go:124, mask_config.go:62-83)
- P17 include_tables         → table-level allow list (mask_config.go:50-52)

Extra/derived columns are prepended in name-sorted order
(debezium/schema.go:342-349,495).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tipoca_stream_spark.functions.hashing import masked_hash


def like_to_regex(pattern: str) -> str:
    """SQL-LIKE-ish → anchored regex, exactly as mask_config.go:443-445: ONLY
    ``%`` is rewritten (to ``.*``); every other character passes through
    untouched and therefore stays *live regex* (``_`` is a literal underscore,
    ``.`` still matches any char). The result is fully anchored and
    case-sensitive."""
    return "^" + pattern.replace("%", ".*") + "$"


@dataclass
class TableMaskRules:
    """Per-table mask rules; all column names are lowercased at construction
    (mask_config.go:62-83)."""

    non_pii_keys: list[str] = field(default_factory=list)
    conditional_non_pii_keys: dict[str, list[str]] = field(default_factory=dict)
    dependent_non_pii_keys: dict[str, dict[str, list[str]]] = field(default_factory=dict)
    length_keys: list[str] = field(default_factory=list)
    mobile_keys: list[str] = field(default_factory=list)
    mapping_pii_keys: list[str] = field(default_factory=list)
    regex_pattern_boolean_keys: dict[str, dict[str, str]] = field(default_factory=dict)
    sort_keys: list[str] = field(default_factory=list)
    dist_keys: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        low = lambda xs: [x.lower() for x in xs]
        self.non_pii_keys = low(self.non_pii_keys)
        self.conditional_non_pii_keys = {
            k.lower(): list(v) for k, v in self.conditional_non_pii_keys.items()
        }
        self.dependent_non_pii_keys = {
            k.lower(): {pk.lower(): list(pv) for pk, pv in prov.items()}
            for k, prov in self.dependent_non_pii_keys.items()
        }
        self.length_keys = low(self.length_keys)
        self.mobile_keys = low(self.mobile_keys)
        self.mapping_pii_keys = low(self.mapping_pii_keys)
        self.regex_pattern_boolean_keys = {
            k.lower(): {n.lower(): p for n, p in v.items()}
            for k, v in self.regex_pattern_boolean_keys.items()
        }
        self.sort_keys = low(self.sort_keys)
        self.dist_keys = low(self.dist_keys)


@dataclass
class MaskConfig:
    """Whole-database mask config (one YAML file in the reference,
    mask_config.go:24-60)."""

    salt: str
    tables: dict[str, TableMaskRules] = field(default_factory=dict)
    include_tables: list[str] | None = None
    algo: str = "sha1"

    def __post_init__(self) -> None:
        self.tables = {k.lower(): v for k, v in self.tables.items()}
        if self.include_tables is not None:
            self.include_tables = [t.lower() for t in self.include_tables]

    def table_included(self, table: str) -> bool:
        """P17 IncludeTables filter (mask_config.go:50-52)."""
        return self.include_tables is None or table.lower() in self.include_tables

    def rules_for(self, table: str) -> TableMaskRules:
        return self.tables.get(table.lower(), TableMaskRules())

    @classmethod
    def from_yaml(cls, path: str, salt: str, algo: str = "sha1") -> "MaskConfig":
        """Load the reference's YAML mask-config format (mask_config.go:24-60;
        the salt arrives separately, as a secret, in the reference too)."""
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f) or {}
        d.setdefault("salt", salt)
        d.setdefault("algo", algo)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "MaskConfig":
        tables = {
            name: TableMaskRules(
                non_pii_keys=t.get("non_pii_keys", []),
                conditional_non_pii_keys=t.get("conditional_non_pii_keys", {}),
                dependent_non_pii_keys=t.get("dependent_non_pii_keys", {}),
                length_keys=t.get("length_keys", []),
                mobile_keys=t.get("mobile_keys", []),
                mapping_pii_keys=t.get("mapping_pii_keys", []),
                regex_pattern_boolean_keys=t.get("regex_pattern_boolean_keys", {}),
                sort_keys=t.get("sort_keys", []),
                dist_keys=t.get("dist_keys", []),
            )
            for name, t in d.get("tables", {}).items()
        }
        return cls(
            salt=d["salt"],
            tables=tables,
            include_tables=d.get("include_tables"),
            algo=d.get("algo", "sha1"),
        )


MOBILE_KEY_INIT_LEN = 5  # masker.go:13-15


def _normalized(col: Column) -> Column:
    """P14: nil or whitespace-only → NULL (masker.go:164-166)."""
    s = col.cast("string")
    return F.when(F.trim(s) == "", F.lit(None).cast("string")).otherwise(s)


def compile_mask_columns(
    df_columns: list[str],
    rules: TableMaskRules,
    salt: str,
    algo: str = "sha1",
    schema_columns: list[str] | None = None,
    passthrough: list[str] | None = None,
) -> list[tuple[str, Column]]:
    """Compile the mask plan for one table into ``(name, Column)`` pairs, in
    final output order: extra/derived columns first (name-sorted,
    debezium/schema.go:495), then the table columns in input order.

    ``passthrough`` columns (engine-added helpers like ``kafkaoffset`` /
    ``debeziumop`` — transformer.go:10-17) are emitted untouched, keeping
    their original types."""
    passthrough = [c.lower() for c in (passthrough or [])]
    cols = [c.lower() for c in df_columns if c.lower() not in passthrough]
    # P15 missing-column backfill (masker.go:51-59)
    backfill = [c.lower() for c in (schema_columns or []) if c.lower() not in cols]

    def src(c: str) -> Column:
        if c in backfill:
            return F.lit(None).cast("string")
        return F.col(c)

    table_wide_unmask = any(m in cols for m in rules.mapping_pii_keys)  # masker.go:159-162

    extras: dict[str, Column] = {}
    outputs: list[tuple[str, Column]] = []

    for c in cols + backfill:
        # Extra/derived columns compute from the RAW value, BEFORE the P14
        # whitespace→NULL normalization (masker.go:95-153 runs the extra-column
        # block on cVal as received; the nil/whitespace check at 164-166 only
        # governs the main column output).
        raw = src(c).cast("string")
        value = _normalized(src(c))
        hashed = masked_hash(value, salt, algo)

        if c in rules.length_keys:  # P9: len(raw); only true NULL → 0 (masker.go:99-111)
            extras[f"{c}_length"] = F.coalesce(F.length(raw), F.lit(0)).cast("int")
        if c in rules.mobile_keys:  # P10: first 5 chars of raw; NULL stays NULL
            extras[f"{c}_init5"] = F.substring(raw, 1, MOBILE_KEY_INIT_LEN)
        if c in rules.mapping_pii_keys:  # P11
            extras[f"hashed_{c}"] = hashed
        for name, pattern in rules.regex_pattern_boolean_keys.get(c, {}).items():  # P12
            # mask_config.go:354-371: case-insensitivity comes from a (?i)
            # prefix on the raw pattern (lowercasing the pattern would corrupt
            # \D/\S/\W classes); a NULL value yields false, not NULL.
            extras[f"{c}_{name}"] = F.coalesce(raw.rlike("(?i)" + pattern), F.lit(False))

        if table_wide_unmask or c in rules.non_pii_keys or c in rules.mapping_pii_keys:
            out = value
        elif c in rules.conditional_non_pii_keys:  # P7
            cond = F.lit(False)
            for pat in rules.conditional_non_pii_keys[c]:
                cond = cond | value.rlike(like_to_regex(pat))
            out = F.when(cond, value).otherwise(hashed)
        elif c in rules.dependent_non_pii_keys:  # P8
            cond = F.lit(False)
            for provider, allowed in rules.dependent_non_pii_keys[c].items():
                pcol = _normalized(src(provider))
                cond = cond | pcol.isin([str(v) for v in allowed])
            out = F.when(cond, value).otherwise(hashed)
        else:  # P5 default mask
            out = hashed
        outputs.append((c, out))

    ordered = [(n, extras[n]) for n in sorted(extras)] + outputs
    ordered += [(c, F.col(c)) for c in passthrough]
    return ordered


def apply_mask(
    df: DataFrame,
    config: MaskConfig,
    table: str,
    schema_columns: list[str] | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Apply the whole masking suite for ``table``. Lowercases column names
    first (P16), then selects the compiled plan in one projection — a single
    narrow map stage, no shuffle."""
    lowered = df.toDF(*[c.lower() for c in df.columns])
    if not config.table_included(table):
        return lowered
    # round 14: the compiled plan is a pure function of (columns, rules,
    # salt, algo, schema, passthrough) — memoize the finished Column list
    # (dataclass repr is value-based); rebuilding the case/sha trees cost
    # ~0.2 s of py4j round trips per query construction
    from tipoca_stream_spark.operators.exprcache import memo_expr

    rules = config.rules_for(table)
    key = (
        "mask_plan",
        tuple(lowered.columns),
        repr(rules),
        config.salt,
        config.algo,
        tuple(schema_columns or ()),
        tuple(passthrough or ()),
    )
    plan = memo_expr(
        key,
        lambda: [
            (name, col.alias(name))
            for name, col in compile_mask_columns(
                lowered.columns,
                rules,
                config.salt,
                config.algo,
                schema_columns,
                passthrough,
            )
        ],
    )
    return lowered.select(*[aliased for _, aliased in plan])
