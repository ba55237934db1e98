"""API-parity odds and ends: backend probe and result plot.

The reference dispatches across six R backends (R/check_data.R:191-241);
this engine has one, so ``detect_backend`` is a shape-compatible probe.
``plot_res`` mirrors R/visualization.R:23-81 (horizontal stacked pass/fail
share per rule) behind an optional matplotlib import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["detect_backend", "plot_res", "plot_res_table", "pretty_val", "round_down", "simple_table", "has_pkg"]


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


def round_down(x: float, digits: int = 2) -> float:
    """Floor at ``digits`` decimals — 99.999999 → 99.99, never rounding a
    not-quite-perfect pass rate up to 100% (R/visualization.R:85-87)."""
    import math

    scale = 10**digits
    return math.floor(x * scale) / scale


def pretty_val(x, digits: int = 2, digits_small: bool = False, align: bool = True):
    """bln/mln/k suffix formatting, R-faithful (R/visualization.R:90-110):
    two decimals with the suffix, trailing ``.0+`` stripped for plain values,
    right-aligned across a vector.  Scalar in → scalar out."""
    import re

    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    out = []
    for v in xs:
        r = str(v)
        for name, brk in (("bln", 1e9), ("mln", 1e6), ("k", 1e3), ("", 1)):
            q = abs(v) // brk
            if 0 < q < 1000:
                r = f"{v / brk:.{digits}f}{name}"
            elif v == 0:
                r = f"{v:.{digits}f}"
        out.append(r.strip())
    if align:
        width = max(len(r) for r in out)
        out = [r.rjust(width) for r in out]
    if not digits_small:
        out = [re.sub(r"\.0+$", "", r) for r in out]
    return out if isinstance(x, (list, tuple)) else out[0]


def plot_res_table(rows) -> list[tuple[str, str, str, str]]:
    """The legend-table half of plot_res (R/visualization.R:66-81): one
    (name, pass, fail, total) row per rule with pretty_val-formatted counts,
    plus the header.  Pure data — renders via matplotlib in plot_res, usable
    standalone (and testable) without it."""
    body = [
        (
            r["name"],
            pretty_val(r["pass"], align=False),
            pretty_val(r["fail"], align=False),
            pretty_val(r["tests"], align=False),
        )
        for r in rows
    ]
    return [("", "Pass", "Fail", "Total")] + body


def plot_res(res: DataFrame, ax=None, labels: bool = True, table: bool = True):
    """Horizontal stacked pass/fail barplot of a check_data result with
    in-bar percentage labels and the per-rule count legend table
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
        _, ax = plt.subplots(figsize=(8, 0.5 * len(rows) + 2))
    ax.barh(names, passes, color="#308344", label="pass")
    ax.barh(names, fails, left=passes, color="#E66820", label="fail")
    ax.set_xlim(0, 1)
    ax.set_xlabel("share of rows")
    if labels:
        for i, (p, f, r) in enumerate(zip(passes, fails, rows[::-1])):
            if p > 0:
                ax.text(
                    p / 2, i,
                    f"{round_down(100 * p)}% ({pretty_val(r['pass'], align=False)})",
                    ha="center", va="center", color="white", fontsize=8,
                )
            if f > 0:
                ax.text(
                    p + f / 2, i,
                    f"{round_down(100 * f)}% ({pretty_val(r['fail'], align=False)})",
                    ha="center", va="center", color="white", fontsize=8,
                )
    if table:
        cells = plot_res_table(rows)
        ax.table(
            cellText=[list(c) for c in cells[1:]],
            colLabels=list(cells[0]),
            loc="bottom",
            bbox=[0.0, -0.55, 1.0, 0.4],
        )
    ax.legend(loc="lower right")
    return ax


def simple_table(d, align: str | None = None) -> str:
    """HTML table with markdown-friendly cells — byte-format port of the
    reference's simple_table (/root/reference/R/misc.R:17-50): same
    indentation, odd/even row classes, and blank-line padding around cells
    containing markdown (backtick or ``[``).

    ``d``: a Spark DataFrame (collected — this is a small presentation
    table), a pandas DataFrame, or a list of dicts.  ``align``: one of
    ``l/r/c`` per column (default all ``l``).  Returns the HTML string (the
    reference cat()s it and returns the data invisibly; returning the string
    is the Python-idiomatic equivalent).
    """
    if isinstance(d, DataFrame):
        cols = d.columns
        rows = [[r[c] for c in cols] for r in d.collect()]
    elif hasattr(d, "columns") and hasattr(d, "itertuples"):  # pandas
        cols = list(d.columns)
        rows = [list(t) for t in d.itertuples(index=False, name=None)]
    else:
        rows = [list(r.values()) for r in d]
        cols = list(d[0].keys()) if d else []
    if align is None:
        align = "l" * len(cols)
    names = {"l": "left", "r": "right", "c": "center"}
    try:
        a = [names[ch] for ch in align]
    except KeyError as exc:
        raise ValueError(f"align characters must be l/r/c, got {exc}") from None
    if len(a) != len(cols):
        raise ValueError(f"align has {len(a)} entries for {len(cols)} columns")

    def has_md(v) -> bool:
        s = "" if v is None else str(v)
        return "`" in s or "[" in s

    lines = ["<table>", '  <thead class="header">']
    lines += [f'    <th style="text-align:{al};">{c}</th>' for al, c in zip(a, cols)]
    lines += ["  </thead>", "  <tbody>"]
    for i, row in enumerate(rows, start=1):
        lines.append(f'<tr class="{"even" if i % 2 == 0 else "odd"}">')
        for al, v in zip(a, row):
            pad = "\n\n" if has_md(v) else ""
            sv = "" if v is None else str(v)
            lines.append(f'      <td style="text-align:{al};">{pad}{sv}{pad}</td>')
        lines.append("</tr>")
    lines += ["  </tbody>", "</table>"]
    return "\n".join(lines)


def has_pkg(p: str) -> bool:
    """True if the named Python package is importable without importing it —
    the reference's has_pkg (R/check_data.R:244, requireNamespace(quietly))
    ported to Python packaging (importlib.util.find_spec).  The reference
    uses it to pick an evaluation backend per input type; here detect_backend
    covers that, and has_pkg gates optional extras (e.g. matplotlib for
    plot_res)."""
    import importlib.util

    try:
        return importlib.util.find_spec(p) is not None
    except (ImportError, ValueError):
        return False
