"""Z-order (Morton) data layout: multi-column clustering keys for
write-time file organization.

The 100 TB problem this solves: parquet pruning works off per-file/
row-group min-max stats, and a table sorted by ONE column gives perfect
pruning on that column and none on any other. Interleaving the bits of
several normalized columns into one Morton key and range-partitioning +
sorting the write on it gives every participating column partial
locality — a 2-D box predicate touches O(perimeter) files instead of
O(table) (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``;
Morton 1966). The reference, loading into Oracle heap tables with
indexes, has no layout operator at all — on a data lake, layout IS the
index.

Everything here is integer bit algebra over already-normalized grid
coordinates — exact, engine-neutral (DuckDB mirrors it with the same
``<< >> & |`` operators), and codegen-friendly: all shift amounts are
Python-literal constants at expression-build time, so no variable-shift
workarounds are needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_grid(
    c: Column, lo: int, hi: int, bits: int = 16
) -> Column:
    """Map an integer column in [lo, hi] onto the [0, 2^bits) grid:
    ``floor((c - lo) * (2^bits - 1) / (hi - lo))``. The numerator stays
    below 2^47 for any 32-bit range at the default 16 bits, so the
    double division is exact and the floor is the true integer quotient
    — identical on both engines. Values are clamped into the range
    first, so out-of-bound rows land on the grid edge instead of
    corrupting the key. ``lo``/``hi`` are caller-supplied constants
    (profile bounds, domain knowledge) — not computed here, so the
    expression stays a pure per-row map with no extra pass."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    cells = (1 << bits) - 1
    clamped = F.least(F.greatest(c.cast("long"), F.lit(lo)), F.lit(hi))
    return F.floor(
        (clamped - F.lit(lo)) * F.lit(cells) / F.lit(hi - lo)
    ).cast("long")


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` grid coordinates (each already
    in [0, 2^bits), e.g. from :func:`normalize_to_grid` — fractional
    inputs are floored). Bit ``b`` of column ``i`` lands at position
    ``b * n_cols + i`` of the key, so the key's high bits alternate
    between columns and sorting by it tiles the space into nested
    quadrants. Total key width ``bits * n_cols`` must fit a long
    (< 63)."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{n} cols x {bits} bits = {bits * n} > 62 key bits")
    ints = [F.floor(c).cast("long") for c in cols]
    parts = []
    for b in range(bits):
        for i, c in enumerate(ints):
            # ((c >> b) & 1) << (b * n + i) — literal shift amounts only
            parts.append(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def sql_zorder_key(col_sqls: Sequence[str], bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` over the same grid coordinates
    (each SQL snippet must already evaluate to the integer grid cell)."""
    n = len(col_sqls)
    parts = []
    for b in range(bits):
        for i, c in enumerate(col_sqls):
            parts.append(f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * n + i})")
    return " | ".join(parts)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol: Column,
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered by a Z-order key: range-partition on the
    key (each output file owns a contiguous Morton range = a tile of the
    multi-dimensional space) and sort within partitions so row-group
    stats stay tight inside each file. One range-exchange + local sort —
    the standard price of any clustered write."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
