"""FastCDC content-defined chunking (operators/cdc.py)."""

from __future__ import annotations

import numpy as np
import pytest

from pinecone_datasets_spark.operators.cdc import (
    cdc_chunk_spans,
    cdc_chunks,
    duplicate_chunk_report,
)


def _blob(seed: int, n: int) -> bytes:
    return np.random.default_rng(seed).integers(
        0, 256, n, dtype=np.uint8
    ).tobytes()


def test_spans_partition_exactly_and_respect_bounds():
    data = _blob(1, 200_000)
    spans = cdc_chunk_spans(data, min_size=256, avg_size=1024,
                            max_size=4096)
    # exact partition
    pos = 0
    for off, ln in spans:
        assert off == pos and ln > 0
        pos += ln
    assert pos == len(data)
    # bounds: every chunk but the last within [min, max]
    for off, ln in spans[:-1]:
        assert 256 <= ln <= 4096
    assert spans[-1][1] <= 4096
    # normalized chunking pulls sizes toward avg: the mean is within
    # a factor ~2 of the target
    mean = len(data) / len(spans)
    assert 512 <= mean <= 2048, mean


def test_edit_locality_boundaries_resync():
    """The CDC selling point: a one-byte INSERTION changes only chunks
    near the edit — boundaries re-synchronize, so the overwhelming
    majority of chunk hashes are shared with the original. Fixed-size
    chunking shares ~nothing past the edit point."""
    import hashlib

    data = _blob(2, 300_000)
    edited = data[:150_000] + b"X" + data[150_000:]
    h1 = {
        hashlib.md5(data[o : o + l]).hexdigest()
        for o, l in cdc_chunk_spans(data)
    }
    h2 = {
        hashlib.md5(edited[o : o + l]).hexdigest()
        for o, l in cdc_chunk_spans(edited)
    }
    shared = len(h1 & h2) / max(len(h1), 1)
    assert shared > 0.9, shared
    # fixed-size chunking for contrast: everything after the edit shifts
    fixed1 = {
        hashlib.md5(data[i : i + 1024]).hexdigest()
        for i in range(0, len(data), 1024)
    }
    fixed2 = {
        hashlib.md5(edited[i : i + 1024]).hexdigest()
        for i in range(0, len(edited), 1024)
    }
    assert len(fixed1 & fixed2) / len(fixed1) < 0.6


def test_guards_and_edges():
    assert cdc_chunk_spans(b"") == []
    assert cdc_chunk_spans(b"tiny") == [(0, 4)]
    assert cdc_chunk_spans(_blob(3, 100)) == [(0, 100)]  # <= min
    with pytest.raises(ValueError, match="min"):
        cdc_chunk_spans(b"x" * 1000, min_size=32)
    with pytest.raises(ValueError, match="power of two"):
        cdc_chunk_spans(b"x" * 1000, min_size=256, avg_size=1000,
                        max_size=4096)
    # pathological constant input: no mask hits -> forced max-size cuts
    spans = cdc_chunk_spans(b"\x00" * 20_000)
    assert all(ln == 4096 for _o, ln in spans[:-1])


def test_cross_file_duplicate_chunks_spark(spark):
    """Two files sharing a large middle region dedupe at the chunk
    level; duplicate_chunk_report prices the reclaimable bytes."""
    shared = _blob(4, 80_000)
    a = _blob(5, 10_000) + shared + _blob(6, 10_000)
    b = _blob(7, 10_000) + shared + _blob(8, 10_000)
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("nul", None)],
        "media_id string, content binary",
    )
    chunks = cdc_chunks(df)
    from pyspark.sql import functions as F

    per_file = {
        r["id"]: r["n"]
        for r in chunks.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per_file) == {"a", "b"}  # NULL blob -> zero rows
    rep = duplicate_chunk_report(chunks).collect()
    assert rep, "shared region must produce duplicate chunks"
    reclaimable = sum(r["reclaimable"] for r in rep)
    # most of the 80KB shared region should be reclaimable
    assert reclaimable > 50_000, reclaimable
    assert all(r["copies"] == 2 and r["n_files"] == 2 for r in rep)
