"""One-pass dataset profiling: per-column health stats at corpus scale.

The first question against any new 100 TB table is "what's in it" —
row count, per-column null rates, ranges, and distinct cardinalities.
The naive answer runs one job per column (or an exact
``countDistinct`` per column — a full shuffle of every column's
values). This profiler answers in a FIXED number of passes regardless
of column count:

* pass 1 — one ``agg`` row computing, for every profiled column at
  once: non-null count, min, max (all map-side partial, one scalar
  row out);
* pass 2 — ONE HyperLogLog pass for all columns together: the columns
  unpivot into (col_name, value) pairs map-side (``explode`` of a
  literal-keyed array — no shuffle of raw values), then the standard
  register MAX keyed by (col_name, reg) — shuffle bounded at
  ``n_cols × 2**p`` rows total.

Output: one row per column ``(column, n_rows, n_nulls, null_frac,
min_str, max_str, est_distinct)`` — min/max as strings so one schema
fits every column type. Deterministic end to end (the HLL is the
md5-portable one from operators/sketch.py), so the whole profile is
DuckDB-replayable (``profile_sql``).

Reference scope note: the reference library answers none of this
(its only reduction is row count, SURVEY §2.4); Layer-B extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketch import hll_estimate, hll_registers, hll_sql


def profile_dataset(
    df: DataFrame,
    columns: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """Profile ``columns`` (default: all non-complex, non-float columns).

    Complex types (arrays/structs/maps/binary) are excluded by default —
    their min/max is meaningless and hashing megabyte blobs for a
    cardinality estimate is rarely what you want. Float/double columns
    are also excluded by default: the profile casts values to string for
    both min/max and the HLL hash, and double-to-string rendering is
    engine-specific (Java ``1.0E7`` vs DuckDB ``10000000.0``), so their
    ``min_str``/``max_str``/``est_distinct`` are NOT oracle-replayable
    (same hazard ``quantile_sketch`` raises on). Pass either kind
    explicitly to opt in; the profile is still internally consistent,
    just not DuckDB-hash-comparable for those columns.
    """
    if columns is None:
        skip = ("array", "struct", "map", "binary", "float", "double")
        columns = [
            f.name
            for f in df.schema.fields
            if not f.dataType.simpleString().startswith(skip)
        ]
    if not columns:
        raise ValueError("no columns to profile")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    # pass 1: one scalar row for everything
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    scalar = df.agg(*aggs)
    stats = scalar.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                        F.col(f"__mn_{c}").alias("min_str"),
                        F.col(f"__mx_{c}").alias("max_str"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.*")

    # pass 2: one multiplexed HLL — unpivot to (column, value) map-side
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.value")
    regs = hll_registers(pairs, "value", "column", p)
    distinct = hll_estimate(regs, "column", p)

    return (
        stats.join(distinct, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            F.round(
                F.when(
                    F.col("n_rows") > 0,
                    F.col("n_nulls") / F.col("n_rows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("null_frac"),
            "min_str",
            "max_str",
            F.round(F.coalesce("est_distinct", F.lit(0.0)), 4).alias(
                "est_distinct"
            ),
        )
        .orderBy("column")
    )


def profile_sql(
    columns: list[str],
    from_clause: str,
    p: int = 12,
) -> str:
    """DuckDB twin of ``profile_dataset`` over the same columns."""
    if not columns:
        raise ValueError("no columns to profile")
    stat_selects = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM {from_clause}"""
        for c in columns
    )
    pair_selects = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS value"
        f" FROM {from_clause}"
        for c in columns
    )
    hll = hll_sql("value", ['"column"'], f"({pair_selects})", p)
    return f"""
WITH stats AS ({stat_selects}),
hll AS ({hll})
SELECT stats."column", n_rows, n_nulls,
       round(CASE WHEN n_rows > 0
                  THEN n_nulls / CAST(n_rows AS DOUBLE) ELSE 0.0 END,
             6) AS null_frac,
       min_str, max_str,
       round(COALESCE(hll.est_distinct, 0.0), 4) AS est_distinct
FROM stats LEFT JOIN hll ON stats."column" = hll."column"
ORDER BY stats."column"
"""
