"""Indexed token shards (operators/shards.py): round-trips,
determinism, guards, BPE composition."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.shards import (
    read_token_shards,
    write_token_shards,
)


def _fixture(spark, n=40, max_id=60000):
    rows = [
        (
            i,
            [((i * 37 + j * 11) % max_id) for j in range(3 + i % 7)]
            if i % 9 != 0
            else [],
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "doc_id long, token_ids array<int>"
    )


@pytest.mark.parametrize("dtype", ["uint16", "uint32"])
def test_roundtrip_exact(spark, tmp_path, dtype):
    rows, df = _fixture(spark)
    path = str(tmp_path / dtype)
    manifest = write_token_shards(
        df, path, num_shards=4, dtype=dtype
    )
    assert manifest["n_docs"] == len(rows)
    assert manifest["n_tokens"] == sum(len(t) for _, t in rows)
    assert len(manifest["shards"]) <= 4
    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path).collect()
    }
    assert back == {i: t for i, t in rows}
    # manifest on disk matches the returned dict
    on_disk = json.load(open(os.path.join(path, "manifest.json")))
    assert on_disk == manifest


def test_atomic_commit_leaves_no_temp_files(spark, tmp_path):
    """ADVICE r7 task-commit protocol: shards land via temp-write +
    os.replace, so after a successful write no ``.inprogress-*`` files
    remain, and a stale temp from a dead attempt neither matches the
    reader's globs nor survives an overwrite of its shard."""
    rows, df = _fixture(spark)
    path = str(tmp_path / "atomic")
    # stale temp from a hypothetical killed attempt, present BEFORE the
    # write: must not confuse the reader (glob-proof name)
    os.makedirs(path, exist_ok=True)
    stale = os.path.join(path, "shard-00000.bin.inprogress-99999")
    open(stale, "wb").write(b"\xde\xad")
    write_token_shards(df, path, num_shards=4)
    names = sorted(os.listdir(path))
    assert not [n for n in names if ".inprogress-" in n and n != os.path.basename(stale)]
    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path).collect()
    }
    assert back == {i: t for i, t in rows}
    # a failed write (dtype guard) must not leave a partial FINAL shard
    bad = spark.createDataFrame(
        [(1, [70000])], "doc_id long, token_ids array<int>"
    )
    path2 = str(tmp_path / "fails")
    with pytest.raises(Exception, match="uint16 range"):
        write_token_shards(bad, path2, num_shards=1, dtype="uint16")
    leftover = [
        n for n in os.listdir(path2) if n.endswith((".bin", ".idx"))
    ] if os.path.isdir(path2) else []
    assert leftover == []


def test_deterministic_bytes(spark, tmp_path):
    _, df = _fixture(spark)
    hashes = []
    for run in ("a", "b"):
        path = str(tmp_path / run)
        write_token_shards(df.repartition(7 if run == "a" else 3), path)
        digest = hashlib.md5()
        for name in sorted(os.listdir(path)):
            digest.update(name.encode())
            digest.update(open(os.path.join(path, name), "rb").read())
        hashes.append(digest.hexdigest())
    assert hashes[0] == hashes[1]  # partitioning cannot change the bytes


def test_guards(spark, tmp_path):
    bad_neg = spark.createDataFrame(
        [(1, [5, -1, 7])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="uint16 range"):
        write_token_shards(bad_neg, str(tmp_path / "neg"), num_shards=1)
    bad_big = spark.createDataFrame(
        [(1, [70000])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="uint16 range"):
        write_token_shards(bad_big, str(tmp_path / "big"), num_shards=1)
    # uint32 takes the same ids fine
    write_token_shards(
        bad_big, str(tmp_path / "ok"), num_shards=1, dtype="uint32"
    )
    ok = read_token_shards(spark, str(tmp_path / "ok")).collect()
    assert ok[0]["token_ids"] == [70000]
    with pytest.raises(ValueError):
        write_token_shards(bad_big, str(tmp_path / "x"), dtype="float32")
    # drift detection: damage a .bin
    _, df = _fixture(spark, n=10)
    p = str(tmp_path / "drift")
    write_token_shards(df, p, num_shards=1)
    bins = [f for f in os.listdir(p) if f.endswith(".bin")]
    with open(os.path.join(p, bins[0]), "ab") as fh:
        fh.write(b"\x00\x00")
    with pytest.raises(Exception, match="drift"):
        read_token_shards(spark, p).collect()


def test_composes_with_bpe_ids(spark, sf_dir, tmp_path):
    """corpus → BPE ids → shards → read back: token mass conserved."""
    from pinecone_datasets_spark.operators.bpe import (
        bpe_tokenize_udf,
        train_bpe,
        word_histogram,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges = train_bpe(word_histogram(docs, max_words=5000), 200)
    ids_udf = bpe_tokenize_udf(merges, ids=True)
    toks = docs.select(
        "doc_id", ids_udf(F.col("text")).alias("token_ids")
    )
    path = str(tmp_path / "bpe")
    manifest = write_token_shards(toks, path, num_shards=3)
    back = read_token_shards(spark, path)
    a = back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("token_ids")).alias("toks"),
    ).collect()[0]
    assert a["n"] == 100
    assert a["toks"] == manifest["n_tokens"] > 0


def test_order_preserving_shards_replay_global_order(spark, tmp_path):
    """order_col mode: disjoint ascending ranges per shard — reading
    shards in name order replays the global order (the curriculum →
    token-shards path)."""
    rows = [(i, float(1000 - i), [i % 100, (i * 3) % 100]) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, position double, token_ids array<int>"
    )
    path = str(tmp_path / "ordered")
    manifest = write_token_shards(
        df.repartition(5), path, num_shards=4, order_col="position"
    )
    assert manifest["order"] == "range:position"
    pos = {i: p for i, p, _ in rows}
    # decode shard-by-shard in name order, concatenating doc ids
    import struct as _struct

    global_ids = []
    for s in manifest["shards"]:
        ib = open(os.path.join(path, s["name"] + ".idx"), "rb").read()
        (n_docs,) = _struct.unpack_from("<Q", ib, 16)
        for k in range(n_docs):
            doc_id, _cnt = _struct.unpack_from("<qq", ib, 24 + 16 * k)
            global_ids.append(doc_id)
    assert len(global_ids) == 60
    keys = [pos[i] for i in global_ids]
    assert keys == sorted(keys)  # shard-major order == global order
    # content round-trips identically in this mode too
    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path).collect()
    }
    assert back == {i: t for i, _, t in rows}


def test_composes_with_byte_bpe_ids(spark, tmp_path):
    """r8: byte-level BPE ids (closed 256+merges alphabet, never -1)
    flow straight into the uint16 shard export and back, losslessly —
    the GPT-2-style end of the training-egress path."""
    from pinecone_datasets_spark.operators.bpe import (
        byte_bpe_decode,
        byte_bpe_tokenize_udf,
        byte_bpe_vocab,
        byte_pretoken_histogram,
        train_byte_bpe,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    merges = train_byte_bpe(byte_pretoken_histogram(docs), n_merges=100)
    vocab = byte_bpe_vocab(merges)
    assert len(vocab) < 1 << 16  # uint16-exportable
    ids_df = docs.select(
        "doc_id",
        byte_bpe_tokenize_udf(merges, ids=True)(F.col("text")).alias(
            "token_ids"
        ),
    )
    path = str(tmp_path / "byte_shards")
    man = write_token_shards(ids_df, path, num_shards=3, dtype="uint16")
    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert man["n_docs"] == len(texts)
    # full lossless circle: text -> ids -> shard bytes -> ids -> text
    for did, ids in back.items():
        toks = [vocab[i] for i in ids]
        assert byte_bpe_decode(toks) == texts[did]


def test_manifest_commit_ignores_loser_attempts(spark, tmp_path):
    """r8 verdict item 3 — manifest-as-commit-log: a manifest-mode
    write uses attempt-unique FINAL names (no rename), the manifest
    lists only winners, and the manifest-trusting reader never opens a
    planted loser attempt (a speculative twin with different bytes).
    The glob reader refuses such a directory loudly instead of
    double-reading the speculated shard."""
    import struct

    rows, df = _fixture(spark)
    path = str(tmp_path / "mcommit")
    manifest = write_token_shards(
        df, path, num_shards=4, dtype="uint16", commit="manifest"
    )
    assert manifest["commit"] == "manifest"
    stems = [s["name"] for s in manifest["shards"]]
    assert all("-a" in s for s in stems)  # attempt-unique final names
    # no rename-protocol temp files in manifest mode
    assert not [f for f in os.listdir(path) if ".inprogress-" in f]

    # plant a LOSER attempt for shard 0: same shard number, different
    # attempt id, drifted payload — exactly what a speculative twin
    # that also finished (or died mid-write) leaves on an object store
    loser_stem = "shard-00000-a999999999"
    with open(os.path.join(path, loser_stem + ".bin"), "wb") as fb:
        fb.write(b"\xff" * 64)
    with open(os.path.join(path, loser_stem + ".idx"), "wb") as fi:
        fi.write(b"TOKIDX01")
        fi.write(struct.pack("<B7x", 2))
        fi.write(struct.pack("<Q", 1))
        fi.write(struct.pack("<qq", 424242, 32))

    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path, use_manifest=True).collect()
    }
    assert back == {i: t for i, t in rows}  # loser never read
    assert 424242 not in back

    # the glob reader would read BOTH attempts — it must refuse
    with pytest.raises(ValueError, match="use_manifest"):
        read_token_shards(spark, path).collect()


def test_use_manifest_reads_rename_mode_dirs_too(spark, tmp_path):
    """The manifest-trusting reader is mode-agnostic: a default
    (rename-committed) directory lists plain stems in its manifest and
    reads back identically through use_manifest=True."""
    rows, df = _fixture(spark, n=20)
    path = str(tmp_path / "rename")
    write_token_shards(df, path, num_shards=2, dtype="uint16")
    back = {
        r["doc_id"]: r["token_ids"]
        for r in read_token_shards(spark, path, use_manifest=True).collect()
    }
    assert back == {i: t for i, t in rows}


def test_manifest_reader_requires_manifest(spark, tmp_path):
    rows, df = _fixture(spark, n=5)
    path = str(tmp_path / "nomanifest")
    write_token_shards(df, path, num_shards=1)
    os.unlink(os.path.join(path, "manifest.json"))
    with pytest.raises(FileNotFoundError, match="manifest.json"):
        read_token_shards(spark, path, use_manifest=True)
    # glob mode still works without a manifest (pre-r9 directories)
    assert read_token_shards(spark, path).count() == len(rows)


def test_bad_commit_mode_rejected(spark, tmp_path):
    _, df = _fixture(spark, n=3)
    with pytest.raises(ValueError, match="commit"):
        write_token_shards(df, str(tmp_path / "x"), commit="yolo")


def test_corrupt_manifest_degrades_glob_read(spark, tmp_path):
    """ADVICE r10 (low): a corrupt/mid-write manifest.json must not
    fail default glob-mode reads (which don't need it) — the
    best-effort refusal check degrades to the glob read; the
    manifest-TRUSTING path still refuses loudly."""
    rows, df = _fixture(spark, n=4)
    path = str(tmp_path / "corrupt")
    write_token_shards(df, path, num_shards=1)
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        fh.write('{"commit": "manif')  # truncated mid-write
    assert read_token_shards(spark, path).count() == len(rows)
    # corrupt != absent (ADVICE r10): strict mode raises ValueError so
    # a caller catching FileNotFoundError-as-absent can't misclassify
    with pytest.raises(ValueError, match="not valid JSON"):
        read_token_shards(spark, path, use_manifest=True)
