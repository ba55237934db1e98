"""Embedding-column dialect functions — declarative validation of
``array<float/double>`` vector columns through the SAME rule machinery as
scalars (the north_star table carries embeddings next to audio payloads;
a corrupt vector — wrong dimension, NaN, zero norm — poisons every
downstream ANN/dedup stage silently).

All functions compile to PURE Catalyst higher-order expressions (aggregate /
exists folds — JVM-side, no Python, fused into the same single-scan
conditional aggregation as every other rule):

    rule("vec_dim(embedding) == 64")
    rule("!vec_has_nan(embedding)")
    rule("vec_norm(embedding) > 0.1")

Reference analog: none (R dataverifyr is scalar-only); registered the same
way the audio dialect extends the expr compiler (``expr.register_function``,
SURVEY §2.5 extension pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..expr import ExprError, register_function

__all__ = ["register_vector_functions"]


def _one_arg(name):
    def check(cols):
        if len(cols) != 1:
            raise ExprError(f"{name}() expects 1 arg, got {len(cols)}")
        return cols[0]

    return check


def _vec_dim(ctx, nodes, cols: list[Column]) -> Column:
    """Element count; NULL vector → NULL (rule NULL→fail semantics apply)."""
    v = _one_arg("vec_dim")(cols)
    return F.when(v.isNull(), F.lit(None).cast("int")).otherwise(F.size(v))


def _vec_norm(ctx, nodes, cols: list[Column]) -> Column:
    """L2 norm via one aggregate fold (NULL elements propagate to NULL)."""
    v = _one_arg("vec_norm")(cols)
    return F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _vec_has_nan(ctx, nodes, cols: list[Column]) -> Column:
    v = _one_arg("vec_has_nan")(cols)
    return F.exists(v, lambda x: F.isnan(x.cast("double")))


def _vec_has_null(ctx, nodes, cols: list[Column]) -> Column:
    v = _one_arg("vec_has_null")(cols)
    return F.exists(v, lambda x: x.isNull())


def _vec_max_abs(ctx, nodes, cols: list[Column]) -> Column:
    v = _one_arg("vec_max_abs")(cols)
    return F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def register_vector_functions() -> None:
    """Idempotent registration of the vector dialect."""
    register_function("vec_dim", _vec_dim)
    register_function("vec_norm", _vec_norm)
    register_function("vec_has_nan", _vec_has_nan)
    register_function("vec_has_null", _vec_has_null)
    register_function("vec_max_abs", _vec_max_abs)


register_vector_functions()  # at import — pure Catalyst, no UDF state to cache
