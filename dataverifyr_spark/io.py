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

from .rules import DataColumn, ReferenceRule, Rule, Ruleset

__all__ = ["read_rules", "write_rules"]

_V1_SECTIONS = ("meta", "data-columns", "data-rules")


def _rule_to_mapping(r: Rule) -> dict[str, Any]:
    d: dict[str, Any] = {
        "name": r.name,
        "expr": r.expr,
        "allow_na": r.allow_na,
        "negate": r.negate,
        "index": r.index,
    }
    if isinstance(r, ReferenceRule):
        d.update(local_col=r.local_col, ref_dataset=r.ref_dataset, ref_col=r.ref_col)
    d.update(r.extra)
    return d


def _col_to_mapping(c: DataColumn) -> dict[str, Any]:
    d: dict[str, Any] = {"col": c.col}
    if c.type is not None:
        d["type"] = c.type
    d["optional"] = c.optional
    if c.description is not None:
        d["description"] = c.description
    return d


def write_rules(rs: Ruleset | Rule, path: str, format: str = "v1") -> None:
    if isinstance(rs, Rule):
        rs = Ruleset([rs])
    if os.path.splitext(path)[1].lower() not in (".yml", ".yaml"):
        raise ValueError("rules file must end in .yml or .yaml (R/im-export.R:22)")
    if format == "v1":
        doc: dict[str, Any] = {}
        if rs.meta:
            doc["meta"] = dict(rs.meta)
        if rs.data_columns:
            doc["data-columns"] = [_col_to_mapping(c) for c in rs.data_columns]
        doc["data-rules"] = [_rule_to_mapping(r) for r in rs.rules]
        payload: Any = doc
    elif format == "pre_v1":
        payload = [_rule_to_mapping(r) for r in rs.rules]
    else:
        raise ValueError(f"unknown format {format!r}; use 'v1' or 'pre_v1'")
    with open(path, "w") as fh:
        yaml.safe_dump(payload, fh, sort_keys=False, default_flow_style=False)


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
