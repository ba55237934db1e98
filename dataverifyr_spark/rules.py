"""Rule, Ruleset, reference-rule and schema-declaration objects.

Driver-side metadata only — no Spark jobs here.  Semantics mirror the
reference: rule construction (R/rule.R:42-62), ruleset ordering + index
stamping (R/rule.R:128-143), ``+`` composition with exact-duplicate dedupe
(R/ruleset_construction.R:9-40), reference rules (R/data_column.R:149-185),
data_column declarations (R/data_column.R:45-69) and rule_meta
(R/data_column.R:72-95).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Iterable

from .expr import ExprError, get_symbols

__all__ = [
    "Rule",
    "ReferenceRule",
    "Ruleset",
    "DataColumn",
    "rule",
    "ruleset",
    "reference_rule",
    "data_column",
    "rule_meta",
    "bind_rules",
]

_TYPE_ALIASES = {
    # declared-type vocabulary of the reference (R/data_column.R:314-329)
    "int": "int",
    "integer": "int",
    "dbl": "double",
    "double": "double",
    "numeric": "double",
    "float": "double",
    "str": "string",
    "string": "string",
    "chr": "string",
    "character": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "logical": "boolean",
}


def _r_bool(b: bool) -> str:
    return "TRUE" if b else "FALSE"


@dataclass(frozen=True)
class Rule:
    """A row-level boolean predicate over column names.

    ``expr`` is a dialect string (see ``expr.py``); ``negate`` wraps the raw
    expression first, ``allow_na`` then ORs an is-null guard per referenced
    symbol (R/check_data.R:277-287).
    """

    expr: str
    name: str = ""
    allow_na: bool = False
    negate: bool = False
    index: int | None = None
    extra: dict[str, Any] = field(default_factory=dict, compare=False, hash=False)

    def __post_init__(self) -> None:
        if not isinstance(self.expr, str) or not self.expr.strip():
            raise ValueError("rule expr must be a non-empty string")
        if not self.name:
            # default name "Rule for: sym1, sym2" (R/rule.R:50-53)
            try:
                syms = get_symbols(self.expr)
            except ExprError:
                syms = []
            object.__setattr__(self, "name", f"Rule for: {', '.join(syms)}")

    @property
    def check_type(self) -> str:
        return "row_rule"

    def symbols(self) -> list[str]:
        return get_symbols(self.expr)

    def _dedupe_key(self) -> tuple:
        # reference dedupes on full rule value ignoring index
        # (R/ruleset_construction.R:24-31)
        return (self.check_type, self.expr, self.name, self.allow_na, self.negate)

    def __add__(self, other):
        # rule + rule / rule + ruleset both form a ruleset with dedupe
        # (R/ruleset_construction.R:9-40; tests/test-ruleset_construction.R:1-19)
        if isinstance(other, Rule):
            return Ruleset([self]) + other
        if isinstance(other, Ruleset):
            return Ruleset([self]) + other
        return NotImplemented

    def __repr__(self) -> str:
        # byte-matches print.rule (R/rule.R:67-74): TRUE/FALSE booleans, the
        # two-space 'negated:' alignment, then every non-core field quoted
        lines = [
            "<Verification Rule>",
            f"  expr: '{self.expr}'",
            f"  name: '{self.name}'",
            f"  allow NA: {_r_bool(self.allow_na)}",
            f"  negated:  {_r_bool(self.negate)}",
        ]
        for k, v in self._extra_fields():
            lines.append(f"  {k}: '{v}'")
        return "\n".join(lines)

    def _extra_fields(self) -> list[tuple[str, Any]]:
        out = list(self.extra.items())
        if self.index is not None:
            out.append(("index", self.index))
        return out


@dataclass(frozen=True, repr=False)
class ReferenceRule(Rule):
    """FK-style membership rule: ``local_col %in% ref_dataset$ref_col``
    (R/data_column.R:149-185).  Evaluated as a distinct-ref join, not through
    the expression compiler."""

    local_col: str = ""
    ref_dataset: str = ""
    ref_col: str = ""

    @property
    def check_type(self) -> str:
        return "reference_rule"

    def _extra_fields(self) -> list[tuple[str, Any]]:
        out: list[tuple[str, Any]] = [
            ("local_col", self.local_col),
            ("ref_dataset", self.ref_dataset),
            ("ref_col", self.ref_col),
        ]
        out += list(self.extra.items())
        if self.index is not None:
            out.append(("index", self.index))
        return out

    def symbols(self) -> list[str]:
        return [self.local_col]

    def _dedupe_key(self) -> tuple:
        return (
            self.check_type,
            self.expr,
            self.name,
            self.allow_na,
            self.negate,
            self.local_col,
            self.ref_dataset,
            self.ref_col,
        )


@dataclass(frozen=True, repr=False)
class UniquenessRule(Rule):
    """PK / uniqueness rule: a row passes iff its key tuple occurs exactly
    once in the dataset.  Graft extension (the reference has no aggregation
    rules — R rules are row-local, R/rule.R:42-62); evaluated as a key-only
    ``groupBy`` count, never through the expression compiler.  ``allow_na``
    rescues rows with a NULL in any key column BEFORE negation (the
    reference-rule flag order, R/data_column.R:353-358); without it a NULL
    key groups with its equal-NULL peers like SQL ``GROUP BY``."""

    unique_cols: tuple[str, ...] = ()

    @property
    def check_type(self) -> str:
        return "uniqueness_rule"

    def _extra_fields(self) -> list[tuple[str, Any]]:
        out: list[tuple[str, Any]] = [("unique_cols", list(self.unique_cols))]
        out += list(self.extra.items())
        if self.index is not None:
            out.append(("index", self.index))
        return out

    def symbols(self) -> list[str]:
        return list(self.unique_cols)

    def _dedupe_key(self) -> tuple:
        return (
            self.check_type,
            self.expr,
            self.name,
            self.allow_na,
            self.negate,
            self.unique_cols,
        )


def unique_rule(
    *cols: str,
    name: str | None = None,
    allow_na: bool = False,
    negate: bool = False,
    **extra: Any,
) -> UniquenessRule:
    """Construct a uniqueness (PK) rule over one or more key columns."""
    if not cols or any(not isinstance(c, str) or not c for c in cols):
        raise ValueError("unique_rule needs at least one non-empty column name")
    joined = ", ".join(cols)
    return UniquenessRule(
        expr=f"is_unique({joined})",
        name=name or f"Uniqueness rule: {joined}",
        allow_na=bool(allow_na),
        negate=bool(negate),
        unique_cols=tuple(cols),
        extra=dict(extra),
    )


def rule(
    expr: str,
    name: str | None = None,
    allow_na: bool = False,
    negate: bool = False,
    **extra: Any,
) -> Rule:
    """Construct a rule (R/rule.R:42-62)."""
    return Rule(
        expr=expr,
        name=name or "",
        allow_na=bool(allow_na),
        negate=bool(negate),
        extra=dict(extra),
    )


def reference_rule(
    local_col: str,
    ref_dataset: str,
    ref_col: str,
    name: str | None = None,
    allow_na: bool = False,
    negate: bool = False,
    **extra: Any,
) -> ReferenceRule:
    """Construct a reference (FK membership) rule (R/data_column.R:149-185)."""
    for arg, label in ((local_col, "local_col"), (ref_dataset, "ref_dataset"), (ref_col, "ref_col")):
        if not isinstance(arg, str) or not arg:
            raise ValueError(f"{label} must be a non-empty string")
    expr = f"{local_col} %in% {ref_dataset}${ref_col}"
    default_name = f"Reference rule: {local_col} in {ref_dataset}${ref_col}"
    return ReferenceRule(
        expr=expr,
        name=name or default_name,
        allow_na=bool(allow_na),
        negate=bool(negate),
        local_col=local_col,
        ref_dataset=ref_dataset,
        ref_col=ref_col,
        extra=dict(extra),
    )


@dataclass(frozen=True)
class DataColumn:
    """Declared schema column (R/data_column.R:45-69)."""

    col: str
    type: str | None = None
    optional: bool = False
    description: str | None = None

    def __post_init__(self) -> None:
        if not isinstance(self.col, str) or not self.col:
            raise ValueError("data_column col must be a non-empty string")
        if self.type is not None and not isinstance(self.type, str):
            raise ValueError("data_column type must be a string or None")
        if not isinstance(self.optional, bool):
            raise ValueError("data_column optional must be a bool")

    def spark_type_family(self) -> str | None:
        """Normalized type family, or None when unknown (unknown ⇒ always
        passes, R/data_column.R:328)."""
        if self.type is None:
            return None
        return _TYPE_ALIASES.get(self.type.lower())


def data_column(
    col: str,
    type: str | None = None,
    optional: bool = False,
    description: str | None = None,
) -> DataColumn:
    return DataColumn(col=col, type=type, optional=optional, description=description)


def rule_meta(**kwargs: Any) -> dict[str, Any]:
    """Ruleset metadata record (R/data_column.R:72-95)."""
    return dict(kwargs)


def validate_data_columns(cols: list[DataColumn]) -> None:
    """Reject duplicate declared column names (R/data_column.R:188-201)."""
    seen: set[str] = set()
    for c in cols:
        if c.col in seen:
            raise ValueError(f"duplicate data_column declaration for '{c.col}'")
        seen.add(c.col)


class Ruleset:
    """Ordered rules with 1-based index stamps + optional schema/meta
    (R/rule.R:128-143)."""

    def __init__(
        self,
        rules: Iterable[Rule] = (),
        data_columns: list[DataColumn] | None = None,
        meta: dict[str, Any] | None = None,
        data_name: str | None = None,
    ):
        self.rules: list[Rule] = []
        for r in rules:
            if not isinstance(r, Rule):
                raise TypeError(f"ruleset accepts Rule objects, got {type(r).__name__}")
            self.rules.append(r)
        self._reindex()
        if data_columns:
            validate_data_columns(data_columns)
        self.data_columns: list[DataColumn] = list(data_columns or [])
        self.meta: dict[str, Any] = dict(meta or {})
        self.data_name: str | None = data_name

    def _reindex(self) -> None:
        self.rules = [_with_index(r, i + 1) for i, r in enumerate(self.rules)]

    def __len__(self) -> int:
        return len(self.rules)

    def __iter__(self):
        return iter(self.rules)

    def __getitem__(self, i: int) -> Rule:
        return self.rules[i]

    def __add__(self, other: "Ruleset | Rule") -> "Ruleset":
        # concat + exact-duplicate dedupe + re-stamp (R/ruleset_construction.R:9-40)
        other_rules = [other] if isinstance(other, Rule) else list(other.rules)
        merged: list[Rule] = []
        seen: set[tuple] = set()
        for r in list(self.rules) + other_rules:
            k = r._dedupe_key()
            if k not in seen:
                seen.add(k)
                merged.append(r)
        other_cols = [] if isinstance(other, Rule) else other.data_columns
        other_meta = {} if isinstance(other, Rule) else other.meta
        cols = list(self.data_columns)
        have = {c.col for c in cols}
        cols += [c for c in other_cols if c.col not in have]
        return Ruleset(
            merged,
            data_columns=cols,
            meta={**other_meta, **self.meta},
            data_name=self.data_name or (None if isinstance(other, Rule) else other.data_name),
        )

    __radd__ = __add__

    def show(self, n: int = 3) -> str:
        """print.ruleset's exact format (R/rule.R:150-163): indexed one-line
        entries, truncating past ``n`` with the reference's literal hint."""
        lines = [f"<Verification Ruleset with {len(self.rules)} elements>"]
        nn = min(len(self.rules), n)
        for r in self.rules[:nn]:
            negated = ", negated" if r.negate else ""
            lines.append(
                f"  [{r.index}] '{r.name}' matching `{r.expr}` "
                f"(allow_na: {_r_bool(r.allow_na)}{negated})"
            )
        if nn != len(self.rules):
            lines.append(
                f"  ... +{len(self.rules) - nn} more. "
                "Use print(ruleset, n = 10) to print more."
            )
        return "\n".join(lines)

    def __repr__(self) -> str:
        return self.show()


def _with_index(r: Rule, index: int) -> Rule:
    if r.index == index:
        return r
    # dataclasses.replace preserves the concrete subtype (ReferenceRule,
    # UniquenessRule, ...) — an explicit Rule(**kwargs) silently downgraded
    # subclasses added after it was written (r5 bug: unique rules lost their
    # type on ruleset() reindexing and fell into the expr-compile path)
    return dataclasses.replace(r, index=index)


def ruleset(
    *rules_: Rule,
    data_columns: list[DataColumn] | None = None,
    meta: dict[str, Any] | None = None,
    data_name: str | None = None,
) -> Ruleset:
    flat: list[Rule] = []
    for r in rules_:
        if isinstance(r, Ruleset):
            flat.extend(r.rules)
        elif isinstance(r, (list, tuple)):
            flat.extend(r)
        else:
            flat.append(r)
    return Ruleset(flat, data_columns=data_columns, meta=meta, data_name=data_name)


def bind_rules(items: Iterable[Rule | Ruleset]) -> Ruleset:
    """Reduce(+) over rules/rulesets (R/ruleset_construction.R:51-53)."""
    acc: Ruleset | None = None
    for it in items:
        rs = it if isinstance(it, Ruleset) else Ruleset([it])
        acc = rs if acc is None else acc + rs
    return acc if acc is not None else Ruleset([])
