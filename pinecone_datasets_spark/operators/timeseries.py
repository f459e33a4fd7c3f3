"""Time-series gap fill and interpolation over bucketed aggregates.

The hypertable-rollup companion ops (TimescaleDB's
``time_bucket_gapfill`` / ``locf`` / ``interpolate``; the reference has
no time-series surface at all — Layer-B extension): given an aggregated
series ``(key, bucket, value)`` with holes where no rows landed, emit a
dense bucket grid per key and fill the holes by carry-forward or linear
interpolation. Without this, dashboards and downstream joins silently
skip empty buckets — an absent hour is not a zero hour.

Scale shapes:

* ``gapfill``: the dense grid comes from per-key min/max bucket + one
  ``sequence``/``explode`` — map-only after a per-key extent aggregate
  whose shuffle carries 2 timestamps per key. The grid left-joins the
  observed series on (key, bucket): one co-partitioned shuffle each.
  Grid size is bounded by (span / step) per key — the operator never
  materializes anything denser than the output it must produce.
* ``locf`` / ``interpolate_linear``: per-key ordered windows
  (last/first with ignoreNulls) — O(1) state per row in WindowExec, no
  per-key buffering, same single shuffle the grid already paid (Spark
  reuses the (key) partitioning across the window stages).
* ``rolling_zscore``: bounded trailing ROWS frame — O(window) state
  per key in WindowExec, again reusing the (key) partitioning.

Determinism: pure plan, no floats beyond the interpolation arithmetic
itself — the DuckDB twin replays bucket grids via generate_series and
the same window frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gapfill(
    series: DataFrame,
    bucket_col: str,
    value_cols: list[str],
    key_cols: list[str] | None = None,
    step: str = "1 hour",
) -> DataFrame:
    """Densify a bucketed series: one row per ``step`` between each
    key's min and max observed bucket, observed values joined on,
    missing buckets carrying NULL values and ``is_gap = true``.

    ``series`` must already be aggregated to one row per (key, bucket)
    — this operator fills holes, it does not re-aggregate.

    Observed buckets that do NOT land on the ``step`` grid anchored at
    the key's min bucket (e.g. a 00:30 row under the default 1-hour
    step) are KEPT as their own rows (``is_gap = false``) via the
    full-outer join — the previous left join silently dropped their
    values while reporting the neighboring grid rows as gaps (r11
    review). If downstream needs strict regular spacing, re-bucket the
    series to the step first."""
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    keys = list(key_cols or [])
    # is_gap derives from the JOIN, not from value nullness: an observed
    # bucket whose value is legitimately NULL is not a gap.
    series = series.withColumn("_observed", F.lit(True))
    ext = series.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = ext.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"INTERVAL {step}"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(series, keys + [bucket_col], "full_outer")
    return joined.select(
        *keys,
        bucket_col,
        *value_cols,
        F.col("_observed").isNull().alias("is_gap"),
    )


def locf(
    filled: DataFrame,
    bucket_col: str,
    value_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over a gapfilled frame: NULL
    values take the most recent non-null value of the same key (leading
    NULLs stay NULL — there is nothing to carry)."""
    keys = list(key_cols or [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = filled
    for v in value_cols:
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out


def rolling_zscore(
    filled: DataFrame,
    bucket_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    window: int = 24,
    min_periods: int = 4,
    tau: float = 3.0,
    round_to: int | None = None,
) -> DataFrame:
    """Trailing z-score anomaly detection over a dense (gapfilled)
    series: each bucket's value against the mean/stddev of the PREVIOUS
    ``window`` buckets of the same key (the current bucket is excluded,
    so a spike cannot dilute its own baseline).

    Adds ``zscore`` (NULL while the trailing frame has fewer than
    ``min_periods`` observed values or zero variance — warm-up and
    flat-line are "can't judge", not "normal") and ``is_anomaly``
    (``|zscore| > tau``; NULL when zscore is NULL). Sample stddev, the
    SQL default, replayable in any engine."""
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_periods < 2:
        raise ValueError(f"min_periods must be >= 2: {min_periods}")
    keys = list(key_cols or [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(-window, -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n = F.count(value_col).over(w)
    z = F.when(
        (n >= F.lit(int(min_periods))) & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    if round_to is not None:
        z = F.round(z, round_to)
    return filled.withColumn("zscore", z).withColumn(
        "is_anomaly", F.abs(F.col("zscore")) > F.lit(float(tau))
    )


def interpolate_linear(
    filled: DataFrame,
    bucket_col: str,
    value_cols: list[str],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Linear interpolation over a gapfilled frame: a NULL run between
    two observed points takes evenly spaced values; leading/trailing
    runs (no anchor on one side) stay NULL.

    Position arithmetic uses the row index within the dense grid, so
    the result is step-size-agnostic."""
    keys = list(key_cols or [])
    wo = Window.partitionBy(*keys).orderBy(bucket_col)
    back = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = wo.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = filled.withColumn("_pos", F.row_number().over(wo))

    def interp(v: str) -> Column:
        pv = F.last(v, ignorenulls=True).over(back)
        nv = F.first(v, ignorenulls=True).over(fwd)
        pp = F.last(
            F.when(F.col(v).isNotNull(), F.col("_pos")), ignorenulls=True
        ).over(back)
        np_ = F.first(
            F.when(F.col(v).isNotNull(), F.col("_pos")), ignorenulls=True
        ).over(fwd)
        frac = (F.col("_pos") - pp) / (np_ - pp)
        return F.when(F.col(v).isNotNull(), F.col(v)).otherwise(
            pv + (nv - pv) * frac
        )

    for v in value_cols:
        out = out.withColumn(v, interp(v))
    return out.drop("_pos")
