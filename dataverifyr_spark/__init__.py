"""dataverifyr_spark — a from-scratch, PySpark-native schema + constraint
validation engine with the query semantics of DavZim/dataverifyr.

Rules compile to Catalyst Column predicates evaluated in ONE fused
aggregation scan; violations extract in one tagged scan; reference rules run
as distinct-ref joins; schema checks are driver-only metadata work.  See
SURVEY.md for the full reference-parity map.
"""

from .check import (
    CheckDataError,
    check_data,
    check_data_by,
    check_data_by_file,
    reference_violations,
    uniqueness_violations,
)
from .describe import describe, describe_by, describe_by_file
from .expr import ExprError, compile_expr, get_symbols, register_function
from .filters import fail_predicate, filter_fails, violation_examples
from .io import read_rules, write_rules
from .misc import detect_backend, has_pkg, plot_res, simple_table
from .operators.vectors import register_vector_functions  # registers vec_* dialect fns
from .suggest import suggest_rules
from .rules import (
    DataColumn,
    ReferenceRule,
    Rule,
    Ruleset,
    UniquenessRule,
    bind_rules,
    data_column,
    reference_rule,
    rule,
    rule_meta,
    ruleset,
    unique_rule,
)

__version__ = "0.1.0"

__all__ = [
    "rule",
    "ruleset",
    "reference_rule",
    "unique_rule",
    "data_column",
    "rule_meta",
    "bind_rules",
    "Rule",
    "Ruleset",
    "ReferenceRule",
    "UniquenessRule",
    "DataColumn",
    "check_data",
    "check_data_by",
    "check_data_by_file",
    "reference_violations",
    "uniqueness_violations",
    "CheckDataError",
    "filter_fails",
    "violation_examples",
    "fail_predicate",
    "describe",
    "describe_by",
    "describe_by_file",
    "read_rules",
    "write_rules",
    "detect_backend",
    "plot_res",
    "simple_table",
    "has_pkg",
    "suggest_rules",
    "compile_expr",
    "get_symbols",
    "register_function",
    "ExprError",
    "__version__",
]
