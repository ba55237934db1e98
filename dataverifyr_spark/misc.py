"""API-parity odds and ends: backend probe and result plot.

The reference dispatches across six R backends (R/check_data.R:191-241);
this engine has one, so ``detect_backend`` is a shape-compatible probe.
``plot_res`` mirrors R/visualization.R:23-81 (horizontal stacked pass/fail
share per rule) behind an optional matplotlib import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["detect_backend", "plot_res", "pretty_val"]


def detect_backend(x) -> str:
    """'pyspark' for DataFrames, 'pandas' for pandas frames (tiny local
    inputs are accepted by check_data via createDataFrame upstream)."""
    if isinstance(x, DataFrame):
        return "pyspark"
    try:
        import pandas as pd

        if isinstance(x, pd.DataFrame):
            return "pandas"
    except ImportError:
        pass
    raise TypeError(f"cannot detect a backend for {type(x).__name__}")


def pretty_val(v: float) -> str:
    """1e3/1e6/1e9 suffix formatting (R/visualization.R:84-110)."""
    for cut, suf in ((1e9, "B"), (1e6, "M"), (1e3, "K")):
        if abs(v) >= cut:
            x = v / cut
            return f"{x:.1f}{suf}".replace(".0", "")
    return str(int(v)) if float(v).is_integer() else f"{v:g}"


def plot_res(res: DataFrame, ax=None):
    """Horizontal stacked pass/fail barplot of a check_data result
    (R/visualization.R:23-81).  Requires matplotlib; returns the axis."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env without matplotlib
        raise ImportError("plot_res requires matplotlib") from exc

    rows = res.select("name", "tests", "pass", "fail").collect()
    names = [r["name"] for r in rows][::-1]
    passes = [r["pass"] / max(r["tests"], 1) for r in rows][::-1]
    fails = [r["fail"] / max(r["tests"], 1) for r in rows][::-1]
    if ax is None:
        _, ax = plt.subplots(figsize=(8, 0.5 * len(rows) + 1))
    ax.barh(names, passes, label="pass")
    ax.barh(names, fails, left=passes, label="fail")
    ax.set_xlim(0, 1)
    ax.set_xlabel("share of rows")
    ax.legend(loc="lower right")
    return ax
