"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column-name schema, and an
order-insensitive value representation. Floats are compared bit-exactly
first and with a tiny tolerance as a diagnostic, so any drift is visible
long before the driver's hash check."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from dynamic_etl_spark.catalog import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{name}.parquet")
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).df()
    finally:
        con.close()


def _canon_cell(v):
    """Type-distinguishing canonical form.

    The driver's hash is representation-sensitive: an int64 ``2`` and a
    float64 ``2.0`` hash differently even though Python says ``2 == 2.0``.
    CORRECTNESS_r05's one red row (heavy_hitter_maintenance) shipped
    because this function used to return raw numbers and the Counter
    comparison used Python ``==`` — numerically-equal-but-differently-typed
    surfaces stayed locally green. Numeric cells are therefore tagged with
    their type kind (``b``/``i``/``f``) so a dtype divergence fails the
    local gate exactly like the driver's."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        # NaN is NOT folded into None: a Spark-NULL vs oracle-NaN surface
        # is representation-distinct to the driver's hash, so it must fail
        # locally too (ADVICE r6 — the float sibling of the r6 int-vs-float
        # hardening). Within a float64 pandas column the two are already
        # conflated by pandas itself; this tag catches the object-column
        # and mixed-dtype cases the conflation doesn't mask.
        return ("f", "nan")
    # array-valued cells (Spark ArrayType / DuckDB LIST come back as
    # list or numpy.ndarray) canonicalize element-wise
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (set, dict)):
        return repr(v)
    if pd.isna(v):
        return None
    # bool is an int subclass — test it first
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return ("b", bool(v))
    if isinstance(v, float) or type(v).__name__ in ("float16", "float32", "float64"):
        # IEEE -0.0 == 0.0 in Python but the two are bit- and driver-
        # hash-distinct (SCALE.md signed-zero trap): tag the sign so a
        # Spark +0.0 vs oracle -0.0 divergence fails locally
        f = float(v)
        if math.isnan(f):  # numpy float32/16 NaN doesn't hit the float check above
            return ("f", "nan")
        return ("f", f, math.copysign(1.0, f))
    if isinstance(v, int) or type(v).__name__ in (
        "int8", "int16", "int32", "int64",
        "uint8", "uint16", "uint32", "uint64",
    ):
        return ("i", int(v))
    if type(v).__name__ == "Decimal":
        # the query-boundary convention surfaces decimals as double; a
        # Decimal reaching the driver is itself a parity bug — keep it
        # distinct from both int and float so it fails loudly
        return ("d", str(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=repr)


@dataclass
class ParityResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle}"
        for issue in self.issues:
            msg += f"\n       - {issue}"
        return msg


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> ParityResult:
    pdf = spark_df.toPandas()
    issues: list[str] = []

    spark_cols, oracle_cols = sorted(pdf.columns), sorted(oracle_df.columns)
    if spark_cols != oracle_cols:
        issues.append(f"schema mismatch: spark={spark_cols} oracle={oracle_cols}")
        return ParityResult(name, False, len(pdf), len(oracle_df), issues)
    if len(pdf) != len(oracle_df):
        issues.append("row count mismatch")

    # dtype-kind strictness: the driver hash distinguishes int64 2 from
    # float64 2.0 (CORRECTNESS_r05 heavy_hitter_maintenance) — surface
    # dtype divergence must fail locally, per column, before values
    for col in spark_cols:
        sk, ok_ = pdf[col].dtype.kind, oracle_df[col].dtype.kind
        if sk != ok_ and not (len(pdf) == 0 and len(oracle_df) == 0):
            issues.append(
                f"dtype-kind mismatch on {col!r}: spark={pdf[col].dtype} "
                f"oracle={oracle_df[col].dtype}"
            )

    s_rows, o_rows = canonicalize(pdf), canonicalize(oracle_df)
    if s_rows != o_rows and not issues:
        # Multiset symmetric difference: exact count of rows present on one
        # side only (the old zip-of-sorted-lists diagnostic could misalign
        # after a single differing value — ADVICE r1).
        from collections import Counter

        s_only = Counter(s_rows) - Counter(o_rows)
        o_only = Counter(o_rows) - Counter(s_rows)
        n_diff = sum(s_only.values()) + sum(o_only.values())
        max_float_dev = 0.0

        def _as_float(cell):
            # float cells canonicalize as ("f", value, sign) tuples
            if isinstance(cell, tuple) and len(cell) == 3 and cell[0] == "f":
                return cell[1]
            return None

        for a, b in zip(sorted(s_only.elements(), key=repr), sorted(o_only.elements(), key=repr)):
            for x, y in zip(a, b):
                fx, fy = _as_float(x), _as_float(y)
                if fx is not None and fy is not None:
                    denom = max(abs(fx), abs(fy), 1e-12)
                    max_float_dev = max(max_float_dev, abs(fx - fy) / denom)
        for row in list(s_only.elements())[:3]:
            issues.append(f"spark-only row: {row!r}")
        for row in list(o_only.elements())[:3]:
            issues.append(f"oracle-only row: {row!r}")
        issues.append(
            f"{n_diff} rows in symmetric difference; "
            f"max rel float dev (approx pairing)={max_float_dev:.3e}"
        )
    elif s_rows != o_rows:
        issues.append("values also differ")

    return ParityResult(name, not issues, len(pdf), len(oracle_df), issues)
