"""Surrogate-key assignment (SURVEY.md §2.5 W5, §4 custom-work item 2).

The reference assigns keys driver-side as ``next_key + i`` over a Python
list (scripts2/load_fact_sales_dw.py:352-357 and 3 more loaders). Two
distributed modes:

- ``contiguous``: gap-free, reproduces reference semantics exactly via
  ``row_number`` over a global window. A global window collapses to a
  single partition — fine for dimension-sized inputs (the only place the
  reference needs it), documented as NOT for fact-scale data.
- ``sparse``: scalable, monotonically increasing but non-contiguous via
  ``monotonically_increasing_id`` — O(1) per row, no shuffle, safe at
  100 TB when callers only need uniqueness above a high-water-mark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_surrogate_keys(
    df: DataFrame,
    order_cols: Sequence[str],
    key_col: str,
    offset: int = 0,
    mode: str = "contiguous",
) -> DataFrame:
    if mode == "contiguous":
        window = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(key_col, (F.row_number().over(window) + F.lit(offset)).cast("long"))
    if mode == "sparse":
        return df.withColumn(
            key_col, (F.monotonically_increasing_id() + F.lit(offset) + 1).cast("long")
        )
    raise ValueError(f"unknown mode: {mode!r}")
