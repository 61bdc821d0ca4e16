"""Result renderers — the four output modes of the reference CLI
(reference ``y-logcli:221-227``: DuckDB ``.mode`` box/list/line) plus the
schema pre-pass and executed-plan echo.

Rendering streams through ``toLocalIterator`` so a large result never
materializes on the driver at once (the sorted partitions arrive in
order, preserving the global sort).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def _rows(df: DataFrame) -> Iterator:
    return df.toLocalIterator(prefetchPartitions=True)


def render_raw(df: DataFrame) -> Iterator[str]:
    """``-o raw``: message only, like ``kubectl logs``."""
    for row in _rows(df):
        yield row.message


def render_columns(df: DataFrame) -> Iterator[str]:
    """``-o columns``: space-separated compact projection."""
    for row in _rows(df):
        yield " ".join("" if v is None else str(v) for v in row)


def render_lines(df: DataFrame) -> Iterator[str]:
    """``-o lines``: blank-line-separated ``key = value`` blocks
    (DuckDB ``.mode line``)."""
    names = df.columns
    width = max(len(n) for n in names)
    first = True
    for row in _rows(df):
        if not first:
            yield ""
        first = False
        for n in names:
            yield f"{n.rjust(width)} = {row[n]}"


def render_table(df: DataFrame, n: int = 10_000) -> str:
    """``-o table``: schema comment lines + boxed table."""
    header = "\n".join(
        f"-- {f.name}: {f.dataType.simpleString()}" for f in df.schema.fields
    )
    body = df._show_string(n, 0, False)
    return f"{header}\n\n{body}"


def render(df: DataFrame, output: str) -> Iterator[str]:
    if output == "raw":
        yield from render_raw(df)
    elif output == "columns":
        yield from render_columns(df)
    elif output == "lines":
        yield from render_lines(df)
    elif output == "table":
        yield render_table(df)
    else:
        raise ValueError(f"unknown output mode {output!r}")
