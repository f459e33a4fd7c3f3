"""Streaming deduplication (SURVEY.md §2.8 extension).

Batch dedup (``operators/dedup.py``) sees the whole corpus at once; an
ingest stream can't. The streaming formulation keys every incoming
document by its content fingerprint and drops repeats with
``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` — Spark keeps the
seen-key set as operator state, so the plan is a single stateful
map-side filter, no join.

State-size is the scale knob: unwatermarked ``dropDuplicates`` state
grows with the number of *distinct* documents ever seen (exact, but
unbounded); ``dropDuplicatesWithinWatermark`` bounds state to the
watermark horizon — the right trade for infinite ingest where dup pairs
arrive close together (crawl recrawls, retry storms).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on the content fingerprint.

    With ``ts_col`` set, uses ``dropDuplicatesWithinWatermark`` —
    bounded state, dups deduped only within the watermark horizon (the
    100 TB-safe default for infinite streams). Without it, plain
    ``dropDuplicates`` on the fingerprint: exact across the whole
    stream, state grows with distinct-doc count (fine for bounded
    replays / availableNow backfills).

    The fingerprint column (md5 of normalized text, the same
    ``doc_fingerprint`` the batch path uses) is added then dropped, so
    output schema == input schema.
    """
    with_fp = docs.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    if ts_col is not None:
        deduped = with_fp.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["_fp"])
    else:
        deduped = with_fp.dropDuplicates(["_fp"])
    return deduped.drop("_fp")
