"""Mutation catalog for tools/mutcheck.py (r11 verdict item 1).

Each Mut plants ONE plausible defect — a dropped filter, an off-by-one
bound, a swapped tiebreak, a flipped boundary, a wrong aggregate, a
changed threshold — via exact in-memory text replacement (see
mutcheck.run_with_mutation). The entry's gate (rowcount + schema +
value hash vs the DuckDB oracle) must BREAK under every mutation; a
survivor means the gate could not catch that defect class and needs a
fixture/assertion fix or an ``adjudicated`` note explaining why the
mutant is semantically equivalent (and where compensating coverage
lives).

Kill-rate results are recorded in COVERAGE.md.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Mut:
    """One deliberate defect. ``path`` is repo-relative; ``old`` must
    occur exactly ``count`` times in that file. ``adjudicated`` marks a
    reviewed survivor: the note explains why the gate can never see
    this mutation (true equivalent mutant) or where the compensating
    coverage lives; adjudicated survivors don't fail the run."""

    key: str
    name: str
    path: str
    old: str
    new: str
    count: int = 1
    adjudicated: str = ""


ENTRY = "__spark_entry__.py"
TEXT = "pinecone_datasets_spark/functions/text.py"
FILTERS = "pinecone_datasets_spark/functions/filters.py"
TIMESERIES = "pinecone_datasets_spark/operators/timeseries.py"
DEDUP = "pinecone_datasets_spark/operators/dedup.py"

MUTATIONS: list[Mut] = [
    # ---------------------------------------------------------- q01
    Mut(
        key="q01_pricing_summary",
        name="shipdate_filter_dropped",
        path=ENTRY,
        old='li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))',
        new="li",
    ),
    Mut(
        key="q01_pricing_summary",
        name="tax_sign_flip",
        path=ENTRY,
        old='* (1 + F.col("l_tax"))',
        new='* (1 - F.col("l_tax"))',
    ),
    # ------------------------------------------------------ q02_q04
    Mut(
        key="q02_q04_revenue_joins",
        name="topk_off_by_one",
        path=ENTRY,
        old='return rev.orderBy(F.desc("revenue"), F.col("c_custkey")).limit(10)',
        new='return rev.orderBy(F.desc("revenue"), F.col("c_custkey")).limit(11)',
    ),
    Mut(
        key="q02_q04_revenue_joins",
        name="topk_tiebreak_dropped",
        path=ENTRY,
        old='return rev.orderBy(F.desc("revenue"), F.col("c_custkey")).limit(10)',
        new='return rev.orderBy(F.desc("revenue")).limit(10)',
        adjudicated=(
            "revenue is a 2-dp SUM of l_extendedprice*(1-l_discount) over"
            " distinct customer order sets; a tie BETWEEN rank 10 and 11"
            " is the only way the dropped tiebreak changes the emitted"
            " SET (the hash sorts rows, so order inside the 10 never"
            " matters). No such tie exists at any SF of the driver"
            " fixtures and one cannot be planted without synthesizing a"
            " different table; the tiebreak exists for determinism."
            " Compensating coverage: topk_off_by_one (same line) proves"
            " the limit boundary itself is live."
        ),
    ),
    Mut(
        key="q02_q04_revenue_joins",
        name="q04_wrong_join_key",
        path=ENTRY,
        old=(
            ".join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)\n"
            "        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)"
        ),
        new=(
            ".join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)\n"
            "        .join(F.broadcast(nation), orders.o_custkey % 25 == nation.n_nationkey)"
        ),
    ),
    # ------------------------------------------------------ q03_q60
    Mut(
        key="q03_q60_semi_anti",
        name="semi_boundary_flip",
        path=ENTRY,
        old='_t(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.05)',
        new='_t(spark, sf_dir, "lineitem").where(F.col("l_discount") >= 0.05)',
    ),
    Mut(
        key="q03_q60_semi_anti",
        name="semi_to_inner",
        path=ENTRY,
        old='orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")',
        new='orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")',
    ),
    Mut(
        key="q03_q60_semi_anti",
        name="anti_year_off_by_one",
        path=ENTRY,
        old='F.year("o_orderdate") == 1995',
        new='F.year("o_orderdate") == 1996',
        count=2,  # q60_anti_join + q80_rich_inactive, both parts of this entry
    ),
    # ------------------------------------------------------ q05_q08
    Mut(
        key="q05_q08_window_ranks",
        name="rank_bound_off_by_one",
        path=ENTRY,
        old='.where(F.col("rn") <= 3)',
        new='.where(F.col("rn") <= 2)',
    ),
    Mut(
        key="q05_q08_window_ranks",
        name="q05_tiebreak_flipped",
        path=ENTRY,
        old='F.desc(F.round(F.col("o_totalprice"), -3)), F.col("o_orderkey")',
        new='F.desc(F.round(F.col("o_totalprice"), -3)), F.desc("o_orderkey")',
    ),
    Mut(
        key="q05_q08_window_ranks",
        name="q08_tiebreak_flipped",
        path=ENTRY,
        old='w = Window.orderBy(F.desc("n_events"), F.col("user_id"))',
        new='w = Window.orderBy(F.desc("n_events"), F.desc("user_id"))',
    ),
    # ---------------------------------------------------------- q06
    Mut(
        key="q06_part_type_stats",
        name="max_to_min",
        path=ENTRY,
        old='F.max("p_size").alias("max_size")',
        new='F.min("p_size").alias("max_size")',
    ),
    Mut(
        key="q06_part_type_stats",
        name="avg_round_coarsened",
        path=ENTRY,
        old='F.round(F.avg("p_retailprice"), 2).alias("avg_price")',
        new='F.round(F.avg("p_retailprice"), 1).alias("avg_price")',
    ),
    # ------------------------------------------------------ q07_q87
    Mut(
        key="q07_q87_hourly_gapfill",
        name="zscore_window_shrunk",
        path=ENTRY,
        old="window=24, min_periods=6, tau=2.5",
        new="window=23, min_periods=6, tau=2.5",
        count=3,  # stream part, batch part, q89 helper — all one series
    ),
    Mut(
        key="q07_q87_hourly_gapfill",
        name="locf_excludes_current",
        path=TIMESERIES,
        old=(
            "        Window.partitionBy(*keys)\n"
            "        .orderBy(bucket_col)\n"
            "        .rowsBetween(Window.unboundedPreceding, Window.currentRow)"
        ),
        new=(
            "        Window.partitionBy(*keys)\n"
            "        .orderBy(bucket_col)\n"
            "        .rowsBetween(Window.unboundedPreceding, -1)"
        ),
    ),
    Mut(
        key="q07_q87_hourly_gapfill",
        name="interp_denominator_off_by_one",
        path=TIMESERIES,
        old='frac = (F.col("_pos") - pp) / (np_ - pp)',
        new='frac = (F.col("_pos") - pp) / (np_ - pp + 1)',
    ),
    # ------------------------------------------------------ q11_q12
    Mut(
        key="q11_q12_filter_compile",
        name="gt_boundary_flip",
        path=FILTERS,
        old='    if op == "$gt":\n        return lhs > rhs',
        new='    if op == "$gt":\n        return lhs >= rhs',
    ),
    Mut(
        key="q11_q12_filter_compile",
        name="lte_boundary_flip",
        path=FILTERS,
        old='    if op == "$lte":\n        return lhs <= rhs',
        new='    if op == "$lte":\n        return lhs < rhs',
    ),
    Mut(
        key="q11_q12_filter_compile",
        name="in_list_truncated",
        path=ENTRY,
        old='{"lang": {"$in": ["de", "fr"]}},',
        new='{"lang": {"$in": ["de"]}},',
    ),
    # ---------------------------------------------------------- q13
    Mut(
        key="q13_text_profile",
        name="wordcount_spaces_only",
        path=TEXT,
        old="F.split(F.trim(_c(text)), WHITESPACE_RUN_PATTERN),",
        new='F.split(F.trim(_c(text)), " "),',
    ),
    Mut(
        key="q13_text_profile",
        name="entropy_log_base_flip",
        path=TEXT,
        old="+ (c.cast(\"double\") / n) * F.log(c.cast(\"double\") / n),",
        new="+ (c.cast(\"double\") / n) * F.log2(c.cast(\"double\") / n),",
    ),
    Mut(
        key="q13_text_profile",
        name="tokencount_floor_not_ceil",
        path=TEXT,
        old='F.ceil(F.length(_c(text)) / F.lit(4.0)).cast("long"),',
        new='F.floor(F.length(_c(text)) / F.lit(4.0)).cast("long"),',
    ),
    # ------------------------------------------------------ q14_q36
    Mut(
        key="q14_q36_corpus_stats",
        name="percentile_prob_nudged",
        path=ENTRY,
        old='F.round(F.percentile("n_chars", F.lit(0.9)), 2).alias("p90"),',
        new='F.round(F.percentile("n_chars", F.lit(0.89)), 2).alias("p90"),',
    ),
    Mut(
        key="q14_q36_corpus_stats",
        name="sketch_k_shrunk",
        path=ENTRY,
        old='quantile_sketch(doc, "n_chars", "lang", k=256, sample_by="doc_id")',
        new='quantile_sketch(doc, "n_chars", "lang", k=64, sample_by="doc_id")',
    ),
    Mut(
        key="q14_q36_corpus_stats",
        name="avg_words_uses_tokens",
        path=ENTRY,
        old='F.round(F.avg(word_count("text")), 2).alias("avg_words"),',
        new='F.round(F.avg(token_count("text")), 2).alias("avg_words"),',
    ),
    # ------------------------------------------------------ q15_q16
    Mut(
        key="q15_q16_dedup_exact",
        name="fingerprint_prefix_only",
        path=TEXT,
        old="    normalized = F.regexp_replace(F.lower(F.trim(_c(text))), WHITESPACE_RUN_PATTERN, \" \")\n    return F.md5(normalized)",
        new="    normalized = F.regexp_replace(F.lower(F.trim(_c(text))), WHITESPACE_RUN_PATTERN, \" \")\n    return F.md5(F.substring(normalized, 1, 100))",
    ),
    Mut(
        key="q15_q16_dedup_exact",
        name="keep_rule_max_not_min",
        path=DEDUP,
        old='keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))',
        new='keep = fp.groupBy("_fp").agg(F.max(id_col).alias(id_col))',
    ),
    Mut(
        key="q15_q16_dedup_exact",
        name="group_threshold_dropped",
        path=DEDUP,
        old='.where(F.col("n_members") > 1)',
        new='.where(F.col("n_members") >= 1)',
    ),
]
