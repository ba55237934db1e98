"""YAML rule persistence (R/im-export.R).

Two formats, key-compatible with the reference so rulesets round-trip across
implementations:
- v1 (R/im-export.R:19-43): top-level ``meta`` / ``data-columns`` /
  ``data-rules`` sections.
- pre_v1: a flat list of rule mappings.

Reference rules are detected on read by the presence of
``local_col``/``ref_dataset``/``ref_col`` keys (R/im-export.R:63-65); a v1
document with sections but no ``data-rules`` errors (R/im-export.R:70-73);
a single flat rule is unwrapped (R/im-export.R:105).
"""

from __future__ import annotations

import os
from typing import Any

import yaml

from .rules import DataColumn, ReferenceRule, Rule, Ruleset, UniquenessRule

__all__ = ["read_rules", "write_rules"]

_V1_SECTIONS = ("meta", "data-columns", "data-rules")


def _rule_to_mapping(r: Rule) -> dict[str, Any]:
    # key order matches R's rule object: name/expr/flags, reference cols,
    # user extras, index LAST (ruleset() appends it) — the byte-exact
    # fixtures in tests/testthat/test-im-export.R:44-58 pin this order
    d: dict[str, Any] = {
        "name": r.name,
        "expr": r.expr,
        "allow_na": r.allow_na,
        "negate": r.negate,
    }
    if isinstance(r, ReferenceRule):
        d.update(local_col=r.local_col, ref_dataset=r.ref_dataset, ref_col=r.ref_col)
    if isinstance(r, UniquenessRule):
        # scalar (comma-joined) so the R-byte YAML writer stays scalar-only.
        # A key column whose NAME contains a comma cannot round-trip through
        # this encoding — it would silently re-split into a different key set
        # on read, changing what the rule validates.  Refuse at write time.
        bad = [c for c in r.unique_cols if "," in c]
        if bad:
            raise ValueError(
                f"uniqueness rule {r.name!r}: column name(s) {bad} contain ',' "
                "and cannot be serialized (unique_cols is comma-joined in YAML)"
            )
        d.update(unique_cols=",".join(r.unique_cols))
    d.update(r.extra)
    d["index"] = r.index
    return d


def _col_to_mapping(c: DataColumn) -> dict[str, Any]:
    d: dict[str, Any] = {"col": c.col}
    if c.type is not None:
        d["type"] = c.type
    d["optional"] = c.optional
    if c.description is not None:
        d["description"] = c.description
    return d


def _yaml_scalar(v: Any) -> str:
    """One scalar, R yaml::write_yaml style: ``~`` for NULL, ``yes``/``no``
    booleans, strings single-quoted only when a plain scalar would not read
    back as the same string (colon-space, leading specials, date-like,
    bool-like, numeric-like, ...)."""
    if v is None:
        return "~"
    if isinstance(v, bool):
        return "yes" if v else "no"
    if isinstance(v, (int, float)):
        return str(v)
    s = str(v)
    try:
        plain_ok = "\n" not in s and yaml.safe_load(s) == s
    except yaml.YAMLError:
        plain_ok = False
    return s if plain_ok else "'" + s.replace("'", "''") + "'"


def _emit_value(key: str, v: Any, lines: list[str]) -> None:
    """Emit ``key: value`` at top level, R yaml::write_yaml layout: empty
    list → ``[]``, list of mappings → ``- k: v`` items at the same indent,
    nested mapping → 2-space-indented keys."""
    if isinstance(v, list):
        if not v:
            lines.append(f"{key}: []")
            return
        lines.append(f"{key}:")
        for item in v:
            _emit_list_item(item, lines)
    elif isinstance(v, dict):
        if not v:
            lines.append(f"{key}: ~")
            return
        lines.append(f"{key}:")
        for k2, v2 in v.items():
            lines.append(f"  {k2}: {_yaml_scalar(v2)}")
    else:
        lines.append(f"{key}: {_yaml_scalar(v)}")


def _emit_list_item(item: dict[str, Any], lines: list[str]) -> None:
    first = True
    for k, v in item.items():
        prefix = "- " if first else "  "
        lines.append(f"{prefix}{k}: {_yaml_scalar(v)}")
        first = False


def write_rules(rs: Ruleset | Rule, path: str, format: str = "v1") -> None:
    """Emit the reference's exact byte format (yaml::write_yaml layout) so
    files written here are line-identical with the R package's output —
    pinned against tests/testthat/test-im-export.R:9-26,:42-58,:73-86,:99-108.
    """
    if isinstance(rs, Rule):
        rs = Ruleset([rs])
    if os.path.splitext(path)[1].lower() not in (".yml", ".yaml"):
        raise ValueError("rules file must end in .yml or .yaml (R/im-export.R:22)")
    lines: list[str] = []
    if format == "v1":
        _emit_value("meta", dict(rs.meta) if rs.meta else None, lines)
        _emit_value("data-columns", [_col_to_mapping(c) for c in rs.data_columns], lines)
        _emit_value("data-rules", [_rule_to_mapping(r) for r in rs.rules], lines)
    elif format == "pre_v1":
        for r in rs.rules:
            _emit_list_item(_rule_to_mapping(r), lines)
    else:
        raise ValueError(f"unknown format {format!r}; use 'v1' or 'pre_v1'")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def _mapping_to_rule(d: dict[str, Any]) -> Rule:
    d = dict(d)
    expr = d.pop("expr", None)
    # multi-line exprs re-joined (R/im-export.R:62,:98)
    if isinstance(expr, str):
        expr = " ".join(line.strip() for line in expr.splitlines()).strip()
    name = d.pop("name", None) or ""
    allow_na = bool(d.pop("allow_na", False))
    negate = bool(d.pop("negate", False))
    d.pop("index", None)
    if {"local_col", "ref_dataset", "ref_col"} <= set(d):
        local_col = d.pop("local_col")
        ref_dataset = d.pop("ref_dataset")
        ref_col = d.pop("ref_col")
        return ReferenceRule(
            expr=expr or f"{local_col} %in% {ref_dataset}${ref_col}",
            name=name or f"Reference rule: {local_col} in {ref_dataset}${ref_col}",
            allow_na=allow_na,
            negate=negate,
            local_col=local_col,
            ref_dataset=ref_dataset,
            ref_col=ref_col,
            extra=d,
        )
    if "unique_cols" in d:
        cols = tuple(c.strip() for c in str(d.pop("unique_cols")).split(",") if c.strip())
        return UniquenessRule(
            expr=expr or f"is_unique({', '.join(cols)})",
            name=name or f"Uniqueness rule: {', '.join(cols)}",
            allow_na=allow_na,
            negate=negate,
            unique_cols=cols,
            extra=d,
        )
    if not expr:
        raise ValueError("rule mapping missing 'expr'")
    return Rule(expr=expr, name=name, allow_na=allow_na, negate=negate, extra=d)


def _mapping_to_col(d: dict[str, Any]) -> DataColumn:
    return DataColumn(
        col=d["col"],
        type=d.get("type"),
        optional=bool(d.get("optional", False)),
        description=d.get("description"),
    )


def read_rules(path: str) -> Ruleset:
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    if doc is None:
        return Ruleset([])
    if isinstance(doc, dict):
        if any(k in doc for k in _V1_SECTIONS):
            if "data-rules" not in doc:
                raise ValueError(
                    f"malformed v1 rules file {path!r}: has sections but no 'data-rules'"
                )
            rules = [_mapping_to_rule(d) for d in (doc.get("data-rules") or [])]
            cols = [_mapping_to_col(d) for d in (doc.get("data-columns") or [])]
            return Ruleset(rules, data_columns=cols, meta=doc.get("meta") or {})
        # single flat rule unwrapped (R/im-export.R:105)
        return Ruleset([_mapping_to_rule(doc)])
    if isinstance(doc, list):
        return Ruleset([_mapping_to_rule(d) for d in doc])
    raise ValueError(f"unrecognized rules file structure in {path!r}")
