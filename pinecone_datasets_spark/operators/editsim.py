"""Edit-distance similarity join (record linkage / fuzzy dedup).

All pairs of strings within Levenshtein distance ``max_distance`` — the
record-linkage primitive for catalog dedup, entity resolution, and
near-identical-document mining where token-level methods are too
coarse.

The scale problem is the pair space: N²/2 Levenshtein verifications is
never acceptable. This implements the classic **prefix filter** of
ED-Join (Xiao, Wang & Lin, VLDB 2008): d edits can destroy at most
``q·d`` of a string's character q-grams, so if two strings are within
distance d, any ``q·d + 1`` grams of one (chosen under a GLOBAL gram
order) must intersect the other's gram set. Ordering grams
rarest-first makes the retained prefixes maximally selective. The
pipeline:

1. per-string distinct q-grams (map-only explode),
2. global gram order = (document frequency, gram) — one hash aggregate,
   joined back (broadcast when the vocabulary fits),
3. per-string rank window (string-sized partitions) keeps the
   ``q·d + 1`` rarest grams — the *prefix*,
4. self-join on prefix grams → candidate pairs (the only corpus-pair
   shuffle, keyed on gram),
5. sound cheap filters (length difference ≤ d) then exact
   ``levenshtein`` verification on the candidates ONLY.

Completeness: the pigeonhole argument makes the filter lossless — the
verified output is exactly the brute-force pair set (tested, and the
q17 entry's DuckDB oracle brute-forces the same contract).

Reference scope note: the reference (pinecone-io/pinecone-datasets)
has no string-similarity operators; Layer-B extension, cited against
its data model only (cfg.py:23-36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    max_distance: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    q: int = 3,
) -> DataFrame:
    """(id_a < id_b, distance) for every pair within ``max_distance``
    Levenshtein edits. Strings with at most ``q·max_distance`` distinct
    grams (this includes everything shorter than ``q`` chars, whose
    gram set is empty) fall back to a length-banded candidate block —
    the prefix filter's pigeonhole guarantee needs ``q·d + 1`` distinct
    grams to survive ``d`` edits."""
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0: {max_distance}")
    if q < 1:
        raise ValueError(f"q must be >= 1: {q}")
    prefix_len = q * max_distance + 1
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).where(F.col("__t").isNotNull())
    grams = base.select(
        "__id",
        F.explode_outer(
            F.expr(
                f"CASE WHEN length(__t) >= {q} THEN"
                f" array_distinct(transform(sequence(1, length(__t) - {q - 1}),"
                f" i -> substring(__t, i, {q})))"
                " ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    gdf = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("__id").orderBy("__df", "g")
    prefix = (
        grams.join(gdf, "g")
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= F.lit(int(prefix_len)))
        .select("__id", "g")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # GRAM-POOR strings fall back to a length-banded candidate block.
    # The pigeonhole guarantee needs >= q·d + 1 DISTINCT grams — d
    # edits destroy at most q·d grams, so a string with fewer can lose
    # its entire gram set and share nothing with a true near-neighbor
    # (r11 review: the original fallback only covered length < q, so
    # e.g. 'abcde'/'azcze' at distance 2 with zero common 3-grams were
    # silently missed; note distinct-gram count, not length, is the
    # right test — 'aaaa…a' of ANY length has ONE distinct gram). At
    # max_distance=0 the band still covers gramless (< q char) strings,
    # whose identical twins the gram join cannot see (r11 review: the
    # old `if max_distance > 0` guard skipped them entirely).
    gcnt = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("__ng"))
    shorts = (
        base.join(gcnt, "__id", "left")
        .where(
            F.coalesce(F.col("__ng"), F.lit(0))
            <= F.lit(int(q * max_distance))
        )
        .select("__id", "__len")
    )
    # Length-banded EQUI-join, not a broadcast nested-loop: the r13
    # broadcast audit demoted the old F.broadcast(shorts) BNLJ because
    # "gram-poor strings are rare in natural text" is a corpus
    # assumption, not a bound — a 100 TB corpus of tiny/repetitive
    # strings makes `shorts` corpus-scale and the broadcast fatal.
    # Bands of width d+1 make the non-equi |len_a − len_b| <= d
    # condition an equi-key: any in-range partner's band differs by at
    # most 1, so exploding the shorts side to its 3 adjacent bands and
    # hash-joining on the band key is lossless; the exact length filter
    # then prunes the corner rows. Everything shuffles on a bounded
    # integer key (AQE skew-split absorbs a hot band of same-length
    # strings) and nothing is ever collected or broadcast.
    width = max_distance + 1
    sa = (
        shorts.select(
            F.col("__id").alias("__sid"),
            F.col("__len").alias("__slen"),
            F.explode(
                F.array(
                    F.floor(F.col("__len") / width) - 1,
                    F.floor(F.col("__len") / width),
                    F.floor(F.col("__len") / width) + 1,
                )
            ).alias("__band"),
        )
    ).alias("sa")
    sb = base.withColumn(
        "__band", F.floor(F.col("__len") / width)
    ).alias("sb")
    short_cand = (
        sa.join(
            sb,
            (F.col("sa.__band") == F.col("sb.__band"))
            & (F.col("sa.__sid") != F.col("sb.__id"))
            & (
                F.abs(F.col("sa.__slen") - F.col("sb.__len"))
                <= max_distance
            ),
        )
        .select(
            F.least(
                F.col("sa.__sid"), F.col("sb.__id")
            ).alias("id_a"),
            F.greatest(
                F.col("sa.__sid"), F.col("sb.__id")
            ).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.unionByName(short_cand).dropDuplicates(
        ["id_a", "id_b"]
    )
    la = base.select(
        F.col("__id").alias("id_a"),
        F.col("__t").alias("__ta"),
        F.col("__len").alias("__la"),
    )
    lb = base.select(
        F.col("__id").alias("id_b"),
        F.col("__t").alias("__tb"),
        F.col("__len").alias("__lb"),
    )
    return (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .where(
            F.abs(F.col("__la") - F.col("__lb")) <= max_distance
        )
        .withColumn(
            "distance", F.levenshtein(F.col("__ta"), F.col("__tb"))
        )
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )
