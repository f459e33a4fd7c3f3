"""KMV (k-minimum-values) distinct-count sketch.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its register layout is engine-private — no other system reproduces its
estimate, so it can only ever be checked "within tolerance". The KMV
sketch estimates distinct cardinality from the k smallest *hash values*
of the column: with a portable hash (md5) the sketch content — and so
the estimate — is bit-reproducible by ANY engine, which turns an
approximate operator into an exactly-oracle-checkable one.

Estimator (Bar-Yossef et al. 2002): hash values to u ~ U[0,1); if the
k-th smallest distinct hash is u_(k), then DV ≈ (k-1)/u_(k); when fewer
than k distinct hashes exist the survivor count IS the exact answer.
u is built from the first 13 hex chars of md5 → 52 bits → exact in a
double on every engine.

Distributed plan:

1. hashing is map-only;
2. dedup FIRST — ``distinct(group, u)``: duplicates collapse in the
   map-side partial aggregate, so each raw value crosses the wire at
   most once per map partition. Dedup cannot be postponed below a raw
   top-k: ``row_number`` counts duplicate hashes, so a partition
   holding k copies of the smallest value would evict every other
   distinct value from its local top-k;
3. a rank window per group with a LITERAL k bound rewrites to
   WindowGroupLimit: after the distinct, each map task forwards at most
   k rows per group into the final per-group sort;
4. reduce to (count, max) per group and apply the estimator.

The k-min set is unionable (k-min of a union = k-min of concatenated
k-min lists), so per-source sketches can be merged without rescanning —
recompute steps 3-4 over the concatenation. If even one distinct pass
is too much, the escape hatch is a per-partition bounded-heap sketch in
``applyInPandas``; not needed at the corpus sizes this repo targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO_52 = float(1 << 52)


def _u01(col: str) -> "F.Column":
    """Portable uniform hash: first 52 bits of md5 as a double in [0,1)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 13), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(_TWO_52)
    )


def _reject_float_hash_col(df: DataFrame, col: str, fn: str) -> None:
    """Every sketch here hashes ``CAST(col AS STRING)`` so the DuckDB
    SQL twins can replay it bit-for-bit — but double→string formats
    differently across engines (Java ``1.0E7`` vs DuckDB
    ``10000000.0``), so a float/double column would silently produce a
    DIFFERENT sketch than the twin with no error. ``quantile_sketch``
    already fails loudly on this; the hash-based sketches must too
    (r11 review)."""
    vt = df.schema[col].dataType.simpleString()
    if vt in ("float", "double"):
        raise ValueError(
            f"{fn}: hashing a {vt} column is not engine-portable"
            " (double->string rendering differs across engines);"
            " cast to string/long first or hash a non-float key column"
        )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    k: int = 64,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group KMV estimate of ``count(distinct value_col)``.

    Returns one row per group with ``est_distinct`` (double). Exact when
    the group has fewer than k distinct values.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    _reject_float_hash_col(df, value_col, "kmv_distinct")
    hashed = (
        df.where(F.col(value_col).isNotNull())
        .select(*groups, _u01(value_col).alias("__u"))
        .distinct()
    )

    w = Window.partitionBy(*groups).orderBy("__u")
    # literal bound -> WindowGroupLimit partial top-k on the map side
    topk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(k))
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise((k - 1) / F.col("__kth"))
    agg = topk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__u").alias("__kth")
    )
    return agg.select(*groups, est.alias(out_col))


def kmv_sql(
    value_expr: str,
    group_cols: list[str],
    from_clause: str,
    k: int = 64,
    out_col: str = "est_distinct",
) -> str:
    """DuckDB twin of ``kmv_distinct`` (same hash, same estimator)."""
    grp = ", ".join(group_cols)
    grp_sel = f"{grp}, " if grp else ""
    part = f"PARTITION BY {grp} " if grp else ""
    return f"""
WITH hashed AS (
  SELECT DISTINCT {grp_sel}
         CAST(concat('0x', substr(md5(CAST({value_expr} AS VARCHAR)), 1, 13))
              AS BIGINT) / {_TWO_52!r} AS u
  FROM {from_clause}
  WHERE {value_expr} IS NOT NULL
), ranked AS (
  SELECT {grp_sel}u,
         row_number() OVER ({part}ORDER BY u) AS rn
  FROM hashed
), topk AS (
  SELECT {grp_sel}count(*) AS n, max(u) AS kth
  FROM ranked WHERE rn <= {k}{" GROUP BY " + grp if grp else ""}
)
SELECT {grp_sel}
       CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
            ELSE ({k} - 1) / kth END AS {out_col}
FROM topk
"""


# ---------------------------------------------------------------------------
# Count-Min sketch: point-frequency estimates in d×w counters
# ---------------------------------------------------------------------------


def _cm_bucket(value: "F.Column", row: "F.Column", width: int) -> "F.Column":
    """Portable bucket hash: first 52 bits of md5("<row>:<value>") mod w.

    Same md5-prefix trick as ``_u01`` so any engine (the DuckDB oracle
    included) reproduces the sketch content bit-for-bit.
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(row.cast("string"), F.lit(":"), value)),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
    )
    return F.pmod(h, F.lit(width))


def cm_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of the frequency
    distribution of ``value_col``: ``depth`` hash rows × ``width``
    counters.

    The exact frequency table shuffles one row per DISTINCT value —
    billions of keys for n-grams/URLs at 100 TB. Here every input row
    explodes into ``depth`` (row, bucket) pairs and a plain
    ``groupBy(row, bucket).count()`` folds them: the aggregation key
    space is d×w REGARDLESS of the number of distinct values, so
    map-side partial aggregation bounds each task's shuffle output at
    d×w rows and the reduce side at d×w total. All built-in
    expressions — no Python, no per-partition state (contrast
    ``mg_heavy_hitters``, which needs mapInPandas because its summary
    is value-addressed).

    Guarantees for the paired estimator ``cm_estimate``: never
    undercounts; overcounts by ≤ e·n/width with probability
    ≥ 1 − exp(−depth) per key. Sketches over disjoint inputs merge by
    (row, bucket) sum — union the frames and re-aggregate.

    Output: (row, bucket, c) — at most d×w rows.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    _reject_float_hash_col(df, value_col, "cm_sketch")
    pairs = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    return (
        pairs.select(
            "row", _cm_bucket(F.col("__v"), F.col("row"), width).alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates: min over the sketch's d counters at
    each key's buckets.

    The sketch is ≤ d×w rows (KBs–MBs) so IT is the broadcast side; the
    key frame can be arbitrarily large. Missing (row, bucket) cells mean
    a zero counter, hence the left join + coalesce — an unseen key
    estimates 0, not null.
    """
    _reject_float_hash_col(keys, key_col, "cm_estimate")
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).select(
        key_col,
        "row",
        _cm_bucket(F.col(key_col).cast("string"), F.col("row"), width).alias(
            "bucket"
        ),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias(out_col)
    )


def cm_sql(
    value_expr: str,
    from_clause: str,
    probe_clause: str,
    probe_key: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> str:
    """DuckDB twin of ``cm_sketch`` + ``cm_estimate`` (same md5 bucket
    hash, same min-of-counters estimator). ``probe_clause`` must yield
    one row per probe key named ``probe_key``."""
    bucket = (
        "CAST(concat('0x', substr(md5(CAST({r} AS VARCHAR) || ':' || "
        "CAST({v} AS VARCHAR)), 1, 13)) AS BIGINT) % {w}"
    )
    sk_bucket = bucket.format(r="seeds.r", v=value_expr, w=width)
    pr_bucket = bucket.format(r="seeds.r", v=probe_key, w=width)
    return f"""
WITH seeds AS (SELECT unnest(range({depth})) AS r),
sketch AS (
  SELECT seeds.r AS row, {sk_bucket} AS bucket, count(*) AS c
  FROM {from_clause} CROSS JOIN seeds
  WHERE {value_expr} IS NOT NULL
  GROUP BY 1, 2
),
probes AS (
  SELECT p.{probe_key}, seeds.r AS row, {pr_bucket} AS bucket
  FROM ({probe_clause}) p CROSS JOIN seeds
)
SELECT probes.{probe_key},
       min(COALESCE(sketch.c, 0)) AS {out_col}
FROM probes LEFT JOIN sketch USING (row, bucket)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: frequent items without a distinct-key shuffle
# ---------------------------------------------------------------------------


def mg_heavy_hitters(
    df: DataFrame,
    value_col: str,
    capacity: int = 1024,
    min_share: float = 0.0,
) -> DataFrame:
    """Frequent items via per-partition Misra-Gries summaries.

    The exact answer (``groupBy(value).count()``) shuffles every
    distinct key; over n-grams or URLs at 100 TB the distinct-key space
    is billions of rows and the shuffle IS the job. A Misra-Gries
    summary (Misra & Gries 1982; mergeability per Agarwal et al.,
    "Mergeable Summaries", PODS'12) keeps at most ``capacity`` counters
    per partition: each partition streams its rows once in
    ``mapInPandas`` and emits ≤ capacity (value, est) rows — the shuffle
    is bounded by partitions × capacity REGARDLESS of the key space.

    Guarantees (deterministic, not probabilistic), with
    err = Σ_p decrements_p ≤ n / (capacity + 1):

    * ``est_count ≤ true count ≤ est_count + err_bound`` for every
      emitted value (MG estimates undercount, never overcount);
    * every value with true count > err_bound appears in the output —
      so with capacity ≥ 1/s, no item with share > s is ever missed.

    ``err_bound`` rides on every row so downstream can decide whether
    the gap matters; ``min_share`` (fraction of total rows) filters the
    merged output by the UPPER estimate (``est_count + err_bound``) —
    conservative in the recall direction: since estimates undercount by
    at most ``err_bound``, any value whose TRUE share meets the
    threshold satisfies the filter, so nothing above the threshold is
    dropped; borderline items whose true share is just below may
    survive (check ``est_count``/``err_bound`` downstream to tighten).
    Filtering by the lower estimate would silently drop true heavy
    hitters undercounted by up to ``err_bound`` (r11 review).

    Output: (value_col, est_count, err_bound, n_total), value column
    keeping its input type.
    """
    import pandas as pd

    field = df.schema[value_col]
    out_schema = (
        f"`{value_col}` {field.dataType.simpleString()}, "
        "est long, dec long, part_n long, pid long"
    )

    def summarize(batches):
        counters: dict = {}
        dec = 0
        n = 0
        pid = -1
        for pdf in batches:
            if len(pdf) and pid < 0:
                pid = int(pdf["_pid"].iloc[0])
            for v in pdf[value_col]:
                if v is None:
                    continue
                n += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all: O(1) amortized via dict rebuild
                    dec += 1
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        if n == 0:
            return
        yield pd.DataFrame(
            {
                value_col: list(counters.keys()),
                "est": list(counters.values()),
                "dec": dec,
                "part_n": n,
                "pid": pid,
            }
        )

    # One summary row-set per input partition; mapInPandas streams the
    # partition through the bounded dict without materializing it. The
    # partition id rides in as a column (python workers are REUSED
    # across partitions, so os.getpid() cannot identify a summary).
    summaries = df.select(
        F.col(value_col), F.spark_partition_id().alias("_pid")
    ).mapInPandas(summarize, schema=out_schema)
    # Two consumers (totals + merge) would each re-run the full input
    # scan; the summary is bounded (partitions × capacity rows), so pin
    # it once. localCheckpoint also truncates the lineage.
    summaries = summaries.localCheckpoint(eager=True)
    # (dec, part_n) repeats on every row of its summary; fold to one row
    # per partition id, then sum — a partitions-sized aggregate.
    totals = (
        summaries.groupBy("pid")
        .agg(F.max("dec").alias("dec"), F.max("part_n").alias("part_n"))
        .agg(
            F.sum(F.col("dec")).alias("err"),
            F.sum(F.col("part_n")).alias("n_total"),
        )
    )
    merged = (
        summaries.groupBy(value_col)
        .agg(F.sum("est").alias("est_count"))
        .crossJoin(F.broadcast(totals))
        .select(
            value_col,
            F.col("est_count"),
            F.col("err").alias("err_bound"),
            F.col("n_total"),
        )
    )
    if min_share > 0.0:
        merged = merged.where(
            (F.col("est_count") + F.col("err_bound"))
            >= F.lit(min_share) * F.col("n_total")
        )
    return merged


# ---------------------------------------------------------------------------
# Bloom filter: portable set-membership sketch
# ---------------------------------------------------------------------------

# 63-bit words so the per-bit mask (1 << bit) never shifts into the sign
# bit: DuckDB raises "Overflow in left shift (1 << 63)" while the JVM
# wraps silently — bit index 62 is the highest both engines agree on.
_BLOOM_WORD = 63


def _bloom_pos(value: "F.Column", seed: "F.Column", n_bits: int) -> "F.Column":
    """Portable bit position: first 52 bits of md5("<seed>:<value>") mod
    n_bits — the same md5-prefix device as ``_u01`` / ``_cm_bucket`` so
    the DuckDB oracle reproduces the filter content bit-for-bit."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit(":"), value)),
                1,
                13,
            ),
            16,
            10,
        )
        .cast("long")
    )
    return F.pmod(h, F.lit(n_bits))


def bloom_build(
    df: DataFrame,
    value_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom filter (Bloom 1970) of the distinct values of ``value_col``,
    packed into 63-bit words: output is (word, bits) with at most
    ceil(n_bits / 63) rows — ~8 bytes per 63 bits of filter.

    Why it exists next to ``incremental_dedup``: the exact path probes
    the full corpus fingerprint column once per incoming batch. The
    Bloom filter is built ONCE (a single corpus pass) and then serves
    every subsequent batch at zero corpus I/O — the membership test is
    a broadcast join against the ≤ n_bits/63-row word table. The price
    is a known false-positive rate (≈ (1 − e^(−kn/m))^k, ~2% at
    10 bits/key with k=4), i.e. a small fraction of genuinely-new rows
    misflagged as seen; pair with the exact path when a false drop is
    unacceptable (the flag marks candidates to confirm, not corpses).

    Distributed shape: each row explodes into ``n_hashes`` (word, bit)
    pairs; duplicates collapse in the map-side partial of the DISTINCT,
    and the final ``groupBy(word)`` bit_or folds at most n_bits rows.
    Aggregation key space is bounded by the filter geometry regardless
    of corpus size (the cm_sketch property). Filters over disjoint
    inputs merge by (word, bit_or) — union and re-aggregate.
    """
    if n_bits < _BLOOM_WORD or n_hashes < 1:
        raise ValueError(
            f"need n_bits >= {_BLOOM_WORD}, n_hashes >= 1; "
            f"got {n_bits}, {n_hashes}"
        )
    _reject_float_hash_col(df, value_col, "bloom_build")
    pos = df.select(
        F.col(value_col).cast("string").alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("__s"),
    ).select(
        _bloom_pos(F.col("__v"), F.col("__s"), n_bits).alias("__p")
    )
    bits = pos.select(
        (F.col("__p") / _BLOOM_WORD).cast("long").alias("word"),
        F.pmod(F.col("__p"), F.lit(_BLOOM_WORD)).cast("int").alias("bit"),
    ).distinct()
    # shiftleft()'s python wrapper only takes a literal shift amount;
    # the SQL function accepts a column.
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
    return bits.groupBy("word").agg(F.bit_or(mask).alias("bits"))


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership probe: ``out_col`` is true iff ALL ``n_hashes`` bits
    for the key are set — false means definitely-absent, true means
    present-or-false-positive.

    The filter (≤ n_bits/63 rows) is the broadcast side; the probe frame
    can be arbitrarily large and never shuffles beyond its own per-key
    group (one row per distinct key comes back, mirroring
    ``cm_estimate``). A word the build never touched has no row — the
    left join's null word reads as all-zero."""
    _reject_float_hash_col(probes, key_col, "bloom_might_contain")
    pr = probes.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("__s"),
    ).select(
        key_col,
        _bloom_pos(
            F.col(key_col).cast("string"), F.col("__s"), n_bits
        ).alias("__p"),
    ).select(
        key_col,
        (F.col("__p") / _BLOOM_WORD).cast("long").alias("word"),
        F.pmod(F.col("__p"), F.lit(_BLOOM_WORD)).cast("int").alias("bit"),
    )
    joined = pr.join(F.broadcast(bloom), "word", "left")
    hit = (
        F.coalesce(F.col("bits"), F.lit(0))
        .bitwiseAND(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        != 0
    )
    return joined.groupBy(key_col).agg(
        F.min(hit.cast("int")).cast("boolean").alias(out_col)
    )


def bloom_sql(
    value_expr: str,
    from_clause: str,
    probe_clause: str,
    probe_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    out_col: str = "might_contain",
) -> str:
    """DuckDB twin of ``bloom_build`` + ``bloom_might_contain`` (same
    md5 positions, same 63-bit words). ``probe_clause`` must yield one
    row per probe key named ``probe_key``."""
    pos = (
        "CAST(concat('0x', substr(md5(CAST({s} AS VARCHAR) || ':' || "
        "CAST({v} AS VARCHAR)), 1, 13)) AS BIGINT) % {m}"
    )
    build_pos = pos.format(s="seeds.s", v=value_expr, m=n_bits)
    probe_pos = pos.format(s="seeds.s", v=probe_key, m=n_bits)
    w = _BLOOM_WORD
    return f"""
WITH seeds AS (SELECT unnest(range({n_hashes})) AS s),
bpos AS (
  SELECT DISTINCT ({build_pos}) // {w} AS word,
                  ({build_pos}) % {w} AS bit
  FROM {from_clause} CROSS JOIN seeds
),
bloom AS (
  SELECT word, bit_or(CAST(1 AS BIGINT) << bit) AS bits
  FROM bpos GROUP BY 1
),
ppos AS (
  SELECT p.{probe_key}, ({probe_pos}) // {w} AS word,
         ({probe_pos}) % {w} AS bit
  FROM ({probe_clause}) p CROSS JOIN seeds
)
SELECT ppos.{probe_key},
       CAST(min(CASE WHEN (COALESCE(bloom.bits, 0)
                           & (CAST(1 AS BIGINT) << ppos.bit)) != 0
                     THEN 1 ELSE 0 END) AS BOOLEAN) AS {out_col}
FROM ppos LEFT JOIN bloom USING (word)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# HyperLogLog: distinct counting in m = 2^p registers
# ---------------------------------------------------------------------------

# Flajolet et al. 2007 bias-correction constants; for m >= 128 the
# closed form 0.7213 / (1 + 1.079/m) applies.
_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _hll_alpha(p: int) -> float:
    return _HLL_ALPHA.get(p, 0.7213 / (1.0 + 1.079 / float(1 << p)))


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Per-group HyperLogLog register table ``(groups..., reg, rho)``.

    Unlike ``approx_count_distinct`` (whose HLL++ register layout is
    engine-private), every bit here is portable: the 52-bit md5 hash
    splits into a register index (low ``p`` bits) and a suffix whose
    leading-zero count is taken via the length of its base-2 string —
    both reproducible by any engine, so the sketch content (and the
    estimate) hash-checks exactly against a DuckDB replay.

    Distributed plan: the (group, reg, rho) projection is map-only and
    the MAX per register folds in the map-side partial aggregate, so at
    most ``m = 2**p`` rows per group leave each map task regardless of
    input size. Register tables are MERGEABLE: union two and re-MAX per
    (group, reg) to sketch a union of sources without rescanning.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    _reject_float_hash_col(df, value_col, "hll_registers")
    m = 1 << p
    rmax = 52 - p + 1  # rho when the whole suffix is zero
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    h = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 13), 16, 10)
        .cast("long")
    )
    j = h.bitwiseAND(F.lit(m - 1))
    df = df.where(F.col(value_col).isNotNull())
    w = F.shiftright(h, p)
    # leading zeros of the (52-p)-bit suffix + 1; bin() has no leading
    # zeros so bit-length == length(bin(w)) for w > 0
    rho = F.when(w == 0, F.lit(rmax)).otherwise(
        F.lit(rmax) - F.length(F.bin(w))
    )
    return (
        df.select(*groups, j.alias("reg"), rho.alias("rho"))
        .groupBy(*groups, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame,
    group_cols: str | list[str] | None = None,
    p: int = 10,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Fold a ``hll_registers`` table into one estimate per group.

    The harmonic sum is computed in scaled-integer space — each
    register contributes ``2**(rmax - rho)`` (a long; absent registers
    contribute ``2**rmax``), so the per-group SUM is order-independent
    and exact (max total ``m * 2**rmax = 2**53`` fits a long). Only the
    final division and the linear-counting ``ln`` touch floating point.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    rmax = 52 - p + 1
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    term = F.pow(F.lit(2.0), F.lit(rmax) - F.col("rho")).cast("long")
    agg = regs.groupBy(*groups).agg(
        F.sum(term).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    s_int = F.col("__s") + (F.lit(m) - F.col("__n")) * F.lit(1 << rmax)
    e_raw = (
        F.lit(_hll_alpha(p) * m * m * float(1 << rmax)) / s_int.cast("double")
    )
    v = (F.lit(m) - F.col("__n")).cast("double")  # zero registers
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(*groups, est.alias(out_col))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    p: int = 10,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group HyperLogLog estimate of ``count(distinct value_col)``.

    Standard error ~= 1.04 / sqrt(2**p) (3.2% at the default p=10).
    """
    regs = hll_registers(df, value_col, group_cols, p)
    return hll_estimate(regs, group_cols, p, out_col)


def hll_sql(
    value_expr: str,
    group_cols: list[str],
    from_clause: str,
    p: int = 10,
    out_col: str = "est_distinct",
) -> str:
    """DuckDB twin of ``hll_distinct`` (same hash, registers, estimator)."""
    m = 1 << p
    rmax = 52 - p + 1
    grp = ", ".join(group_cols)
    grp_sel = f"{grp}, " if grp else ""
    grp_by = f" GROUP BY {grp}" if grp else ""
    alpha_num = _hll_alpha(p) * m * m * float(1 << rmax)
    return f"""
WITH h AS (
  SELECT {grp_sel}
         CAST(concat('0x', substr(md5(CAST({value_expr} AS VARCHAR)), 1, 13))
              AS BIGINT) AS hv
  FROM {from_clause}
  WHERE {value_expr} IS NOT NULL
), regs AS (
  SELECT {grp_sel}hv % {m} AS reg,
         max(CASE WHEN hv // {m} = 0 THEN {rmax}
                  ELSE {rmax} - length(bin(hv // {m})) END) AS rho
  FROM h GROUP BY {grp_sel}reg
), folded AS (
  SELECT {grp_sel}
         CAST(sum(CAST(pow(2.0, {rmax} - rho) AS BIGINT)) AS BIGINT) AS s,
         count(*) AS n
  FROM regs{grp_by}
)
SELECT {grp_sel}
       CASE WHEN ({alpha_num!r} / CAST(s + ({m} - n) * CAST(pow(2.0, {rmax}) AS BIGINT) AS DOUBLE)) <= {2.5 * m}
                 AND ({m} - n) > 0
            THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - n AS DOUBLE))
            ELSE {alpha_num!r} / CAST(s + ({m} - n) * CAST(pow(2.0, {rmax}) AS BIGINT) AS DOUBLE)
       END AS {out_col}
FROM folded
"""


# ---------------------------------------------------------------------------
# Quantile sketch: deterministic bottom-k hash sample + exact quantiles
# ---------------------------------------------------------------------------


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    k: int = 1024,
    sample_by: str | None = None,
) -> DataFrame:
    """Per-group quantile sample ``(groups..., u, v)``: the ``k`` rows
    with the smallest portable hash of ``sample_by`` (default: the
    value itself) — a deterministic uniform sample.

    This is the quantile analogue of the KMV sketch: Spark's
    ``approx_percentile`` (KLL-ish) has engine-private state, so it can
    only ever be checked "within tolerance"; a hash-selected bottom-k
    is bit-reproducible by ANY engine, and MERGEABLE — the bottom-k of
    a union is the bottom-k of the concatenated per-source bottom-k's,
    so per-source sketches merge without rescanning.

    Distributed plan: hash is map-only; the rank window has a LITERAL
    bound so it rewrites to WindowGroupLimit — each map task forwards
    at most k rows per group. Quantile error is sampling error,
    ~O(1/sqrt(k)) on the rank scale.

    ``sample_by``: hash a KEY column (e.g. a unique id) when the value
    column has heavy duplicate mass — hashing the value itself
    collapses duplicates into one sampled row, biasing the sample;
    with a unique key the sample is exactly uniform over rows.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    if sample_by is None:
        vt = df.schema[value_col].dataType.simpleString()
        if vt in ("float", "double"):
            # Double->string casts format differently across engines
            # (Java '1.0E7' vs DuckDB '10000000.0'), so hashing a float
            # VALUE would silently select different bottom-k rows than
            # the SQL twin. Make the caller pick a portable key.
            raise ValueError(
                "quantile_sketch: pass sample_by=<a non-float key column>"
                f" when the value column is {vt} — hashing float values"
                " is not engine-portable"
            )
    basis = sample_by or value_col
    # NULL sample keys would sort NULLS FIRST in Spark and NULLS LAST
    # in DuckDB — and bias the sample toward the NULL-key rows; exclude
    # them on both engines (documented: rows with a NULL sample key do
    # not participate in the sample)
    sampled = df.where(
        F.col(value_col).isNotNull() & F.col(basis).isNotNull()
    ).select(
        *groups, _u01(basis).alias("u"), F.col(value_col).alias("v")
    )
    w = Window.partitionBy(*groups).orderBy("u", "v")
    return (
        sampled.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.lit(k))
        .drop("__rn")
    )


def quantile_estimate(
    sketch: DataFrame,
    probs: list[float],
    group_cols: str | list[str] | None = None,
    out_col: str = "q",
) -> DataFrame:
    """Exact type-7 (linear-interpolated) quantiles of a
    ``quantile_sketch`` sample: one row per (group, prob).

    Runs entirely on the ≤k-row-per-group sample: a rank window and an
    arithmetic interpolation — no further passes over the data. Output
    columns: ``(groups..., p, <out_col>)``.
    """
    if not probs or any(not 0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be within [0, 1], got {probs}")
    groups = (
        []
        if group_cols is None
        else [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols)
    )
    w = Window.partitionBy(*groups).orderBy(F.col("v").cast("double"), "u")
    ranked = sketch.select(
        *groups,
        F.col("v").cast("double").alias("v"),
        F.col("u"),
    ).select(
        *groups,
        "v",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy(*groups)).alias("n"),
    )
    probs_df = sketch.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    # type-7: h = (n-1)p + 1; q = v[floor(h)] + (h - floor(h)) *
    # (v[floor(h)+1] - v[floor(h)]) — expressed as a per-(group, p)
    # aggregate over the two straddling ranks
    j = ranked.crossJoin(F.broadcast(probs_df))
    h = (F.col("n") - 1) * F.col("p") + 1
    lo = F.floor(h)
    contrib = F.when(
        F.col("i") == lo, F.col("v") * (1.0 - (h - lo))
    ).when(
        (F.col("i") == lo + 1) & (h > lo), F.col("v") * (h - lo)
    ).otherwise(F.lit(0.0))
    picked = j.where((F.col("i") == lo) | ((F.col("i") == lo + 1) & (h > lo)))
    return (
        picked.groupBy(*groups, "p")
        .agg(F.sum(contrib).alias(out_col))
        .orderBy(*groups, "p")
    )


def quantile_sketch_sql(
    value_expr: str,
    group_cols: list[str],
    from_clause: str,
    probs: list[float],
    k: int = 1024,
    sample_by: str | None = None,
    out_col: str = "q",
) -> str:
    """DuckDB twin of ``quantile_sketch`` + ``quantile_estimate``."""
    basis = sample_by or value_expr
    grp = ", ".join(group_cols)
    grp_sel = f"{grp}, " if grp else ""
    part = f"PARTITION BY {grp} " if grp else ""
    probs_rows = ", ".join(f"({float(p)!r})" for p in probs)
    return f"""
WITH sampled AS (
  SELECT {grp_sel}
         CAST(concat('0x', substr(md5(CAST({basis} AS VARCHAR)), 1, 13))
              AS BIGINT) / {_TWO_52!r} AS u,
         {value_expr} AS v
  FROM {from_clause}
  WHERE {value_expr} IS NOT NULL AND ({basis}) IS NOT NULL
), sk AS (
  SELECT * FROM (
    SELECT {grp_sel}u, v,
           row_number() OVER ({part}ORDER BY u, v) AS rn
    FROM sampled)
  WHERE rn <= {k}
), ranked AS (
  SELECT {grp_sel}CAST(v AS DOUBLE) AS v,
         row_number() OVER ({part}ORDER BY CAST(v AS DOUBLE), u) AS i,
         count(*) OVER ({part.rstrip() if part else ''}) AS n
  FROM sk
), probs AS (SELECT CAST(pv AS DOUBLE) AS p FROM (VALUES {probs_rows}) t(pv))
SELECT {grp_sel}p,
       sum(CASE
             WHEN i = floor((n-1)*p + 1)
               THEN v * (1.0 - ((n-1)*p + 1 - floor((n-1)*p + 1)))
             WHEN i = floor((n-1)*p + 1) + 1
                  AND (n-1)*p + 1 > floor((n-1)*p + 1)
               THEN v * ((n-1)*p + 1 - floor((n-1)*p + 1))
             ELSE 0.0
           END) AS {out_col}
FROM ranked CROSS JOIN probs
WHERE i = floor((n-1)*p + 1)
   OR (i = floor((n-1)*p + 1) + 1 AND (n-1)*p + 1 > floor((n-1)*p + 1))
GROUP BY {grp_sel}p
ORDER BY {grp_sel}p
"""
