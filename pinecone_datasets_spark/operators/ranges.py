"""Range (interval) join: pair rows whose timestamps fall in a window.

A naive ``l.join(r, (r.ts >= l.ts + lower) & (r.ts <= l.ts + upper))`` is
a theta-join: Spark plans it as BroadcastNestedLoopJoin (or a per-key
cross product when an equi-key is present), which is O(|L|·|R|) per key —
fatal at scale. The distributed-native plan is time bucketing:

1. pick a bucket width ``w >= upper - lower`` (one window never spans
   more than 2 buckets),
2. right rows land in bucket ``floor(ts / w)`` — one row each,
3. each left row *explodes to the (<=2) distinct buckets* its window
   ``[ts+lower, ts+upper]`` overlaps,
4. equi-join on (key, bucket) — a plain shuffled hash join — then apply
   the exact range predicate as a post-filter.

Cost: left is duplicated at most 2x, the join is an equi-join Catalyst
can shuffle-partition (AQE handles skew), and the exact predicate prunes
the slack. This is the standard interval-join decomposition (same shape
Flink's interval join and KDB's window join use).

Timestamps are handled as epoch microseconds (BIGINT) internally so the
bucket arithmetic is exact integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LTS = "__rj_lts"
_RTS = "__rj_rts"
_BKT = "__rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join pairs where ``right.ts`` is within
    ``[left.ts + lower_us, left.ts + upper_us]`` (microseconds, inclusive)
    and the key columns match. Non-key output columns are prefixed to
    disambiguate. ``lower_us <= upper_us`` required; both may be negative
    (e.g. lower=-300e6, upper=0 → "right within the 5 min before left").
    """
    if lower_us > upper_us:
        raise ValueError(f"lower_us ({lower_us}) > upper_us ({upper_us})")
    # coerce to int: the docstring's own -300e6 example is a float, and
    # a float literal in the bucket expression makes SQL `div` fail
    # analysis (IntegralDivide rejects double operands) — r11 review
    lower_us, upper_us = int(lower_us), int(upper_us)
    keys = [on] if isinstance(on, str) else list(on)
    width = max(upper_us - lower_us, 1)

    def _us(df: DataFrame, col: str) -> F.Column:
        # TimestampType → exact integer epoch-µs; TIMESTAMP_NTZ is
        # interpreted as UTC wall-clock (cast first — unix_micros rejects
        # NTZ outright); integral columns pass through (already epoch-µs
        # by contract).
        tname = df.schema[col].dataType.typeName()
        if tname == "timestamp":
            return F.unix_micros(F.col(col))
        if tname == "timestamp_ntz":
            return F.unix_micros(F.col(col).cast("timestamp"))
        return F.col(col)

    r = right.select(
        *keys,
        _us(right, right_ts).alias(_RTS),
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in keys
        ],
    ).withColumn(_BKT, F.expr(f"{_RTS} div {width}"))

    lo, hi = F.col(_LTS) + F.lit(lower_us), F.col(_LTS) + F.lit(upper_us)
    l = (
        left.select(
            *keys,
            _us(left, left_ts).alias(_LTS),
            *[
                F.col(c).alias(f"{left_prefix}{c}")
                for c in left.columns
                if c not in keys
            ],
        )
        .withColumn(
            _BKT,
            F.explode(
                F.array_distinct(
                    F.array(
                        F.expr(f"({_LTS} + {lower_us}) div {width}"),
                        F.expr(f"({_LTS} + {upper_us}) div {width}"),
                    )
                )
            ),
        )
    )
    joined = l.join(r, [*keys, _BKT]).where(
        (F.col(_RTS) >= lo) & (F.col(_RTS) <= hi)
    )
    return joined.drop(_BKT).withColumnsRenamed(
        {_LTS: f"{left_prefix}{left_ts}_us", _RTS: f"{right_prefix}{right_ts}_us"}
    )
