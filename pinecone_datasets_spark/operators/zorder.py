"""Z-order (Morton) clustering for multi-dimensional file pruning.

Range-clustering a table on ONE column (compact.py) makes that column's
parquet min/max stats tight and prunable — but a second predicate column
stays shuffled across every file. Interleaving the bits of two or more
key columns into a single Morton value and range-partitioning on THAT
gives every clustered column locally-tight min/max stats: a box
predicate over d dimensions skips to ~N^((d-1)/d) of the files instead
of scanning all of them. This is the layout trick Delta/Iceberg expose
as ``OPTIMIZE ZORDER BY``; here it is a plain column expression plus the
same temp-dir-and-swap rewrite compaction uses.

Everything is integer bit arithmetic in built-in expressions (shiftleft/
shiftright/bitwiseAND/bitwiseOR) — map-only, codegen-side, exactly
reproducible in any engine with bit ops (the DuckDB oracle runs the
same unrolled expression). The only shuffle in a z-ordered rewrite is
``repartitionByRange`` on the z-value (one range-sampling pass + one
exchange), identical in cost to single-column clustering.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column: bit ``i``
    of column ``j`` lands at position ``i * n + j``. Inputs must already
    be non-negative integers below ``2**bits`` (bucketize first —
    integer truncation, not float scaling, so the mapping is exactly
    portable). Requires ``bits * n <= 62`` to stay in a signed long."""
    n = len(cols)
    if n < 2:
        raise ValueError("interleave_bits needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(
            f"bits*cols = {bits * n} exceeds the 62-bit budget of a long"
        )
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = [
        F.shiftleft(
            F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
        )
        for j, c in enumerate(cs)
        for i in range(bits)
    ]
    # Column.__or__ is logical OR; bit-merge needs bitwiseOR
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql(col_names: list[str], bits: int = 16) -> str:
    """The same interleave as an unrolled ANSI-ish SQL expression (for
    oracle twins / engines without a morton builtin)."""
    n = len(col_names)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(col_names)
        for i in range(bits)
    ]
    return " | ".join(terms)


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "zval",
) -> DataFrame:
    """Append a Morton value over ``cols``, min-max bucketized to
    ``bits`` bits each. ``bounds`` ({col: (min, max)}) skips the bounds
    scan — pass them when known (e.g. from table stats); otherwise ONE
    aggregate row is collected (same pattern as drop-null-columns)."""
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo, hi = bounds[c]
        if lo is None or hi is None:
            # all-NULL clustered column: min/max collect as None and
            # float(None) raised an opaque TypeError (r11 review).
            # Treat like a constant column — every row lands in bucket
            # 0 on this dimension, the same thing span<=0 does.
            buckets.append(F.lit(0))
            continue
        span = float(hi) - float(lo)
        if span <= 0:
            buckets.append(F.lit(0))
        else:
            scaled = (F.col(c).cast("double") - float(lo)) / span * top
            buckets.append(
                F.least(F.lit(top), F.greatest(F.lit(0), scaled.cast("long")))
            )
    return df.withColumn(out_col, interleave_bits(buckets, bits=bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-clustered on the
    Morton value of ``cols`` — every clustered column gets locally tight
    min/max stats, so box predicates prune files on any of them."""
    z = zorder_value(df, cols, bits=bits, bounds=bounds)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
