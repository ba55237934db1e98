"""Executor-side warning capture for UDF-backed dialect functions.

The reference records ANY warning a rule's evaluation raises into the result
row's ``warn`` column (R/check_data.R:248-253).  In Spark the rule bodies run
inside Arrow batches on executors, where an ordinary ``warnings.catch_warnings``
on the driver sees nothing — so UDF impls are wrapped with :func:`capturing`,
which collects Python warnings raised during each batch into a set-union
ACCUMULATOR keyed ``(function_name, message)``.  ``check_data`` snapshots the
accumulator around the fused job and attributes new entries to the rules whose
expressions call that function (via ``expr.get_called_functions``).

The accumulator is per-SparkContext and tiny (distinct messages only);
capture adds one ``catch_warnings`` context per Arrow batch, not per row.
"""

from __future__ import annotations

import warnings
from typing import Callable

from pyspark import AccumulatorParam, SparkContext

__all__ = ["capturing", "warning_accumulator", "snapshot", "new_since"]


class _SetUnionParam(AccumulatorParam):
    def zero(self, value):
        return set()

    def addInPlace(self, a, b):
        a |= b
        return a


_acc = None
_acc_ctx_id = None


def warning_accumulator():
    """The active SparkContext's warning accumulator (created lazily; a new
    context after a restart gets a fresh one)."""
    global _acc, _acc_ctx_id
    sc = SparkContext._active_spark_context
    if sc is None:
        return None
    ctx_id = id(sc)
    if _acc is None or _acc_ctx_id != ctx_id:
        _acc = sc.accumulator(set(), _SetUnionParam())
        _acc_ctx_id = ctx_id
    return _acc


def capturing(name: str, impl: Callable) -> Callable:
    """Wrap a (pandas-)UDF impl so Python warnings raised inside a batch are
    recorded as ``(name, message)`` in the warning accumulator."""
    acc = warning_accumulator()

    def wrapped(*args):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = impl(*args)
        if caught and acc is not None:
            acc.add({(name, str(c.message)) for c in caught})
        return out

    wrapped.__name__ = getattr(impl, "__name__", name)
    return wrapped


def snapshot() -> set:
    acc = warning_accumulator()
    return set(acc.value) if acc is not None else set()


def new_since(before: set) -> set:
    acc = warning_accumulator()
    return (set(acc.value) - before) if acc is not None else set()
