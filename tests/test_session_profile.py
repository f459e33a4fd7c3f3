"""The engine session profile IS the scale contract — pin it.

r13: the sf1 hash sweep OOMed the driver inside a statically-planned
auto-broadcast of a corpus-derived intermediate (shingle dictionary /
per-doc size map — Catalyst's size estimate for explode/agg chains was
garbage). The fix is a profile property, so a test must hold it: static
auto-broadcast disabled, AQE runtime-size promotion enabled. A refactor
that drops either line silently reverts to estimate-driven broadcasts
and the failure only reappears on a big fixture.
"""

from __future__ import annotations

import pinecone_datasets_spark.session as sess


class _RecorderBuilder:
    def __init__(self):
        self.confs: dict[str, str] = {}
        self.master_value = None

    def master(self, m):
        self.master_value = m
        return self

    def appName(self, name):
        return self

    def config(self, k, v):
        self.confs[k] = v
        return self

    def getOrCreate(self):
        return self


class _StubSparkSession:
    builder = None  # set per-test


def _profile(monkeypatch, **kwargs) -> dict[str, str]:
    rec = _RecorderBuilder()
    stub = _StubSparkSession
    stub.builder = rec
    monkeypatch.setattr(sess, "SparkSession", stub)
    out = sess.get_spark_session(**kwargs)
    assert out is rec
    return rec.confs


def test_broadcast_discipline_runtime_sizes_only(monkeypatch):
    confs = _profile(monkeypatch)
    # static planner: never broadcast from size ESTIMATES
    assert confs["spark.sql.autoBroadcastJoinThreshold"] == "-1"
    # AQE: re-promote to broadcast from MEASURED post-shuffle bytes
    assert confs["spark.sql.adaptive.autoBroadcastJoinThreshold"] == (
        "10485760"
    )
    assert confs["spark.sql.adaptive.enabled"] == "true"


def test_scale_profile_core_lines(monkeypatch):
    confs = _profile(monkeypatch)
    assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert confs["spark.sql.adaptive.coalescePartitions.enabled"] == "true"
    assert confs["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert confs["spark.sql.parquet.filterPushdown"] == "true"
    assert int(confs["spark.sql.files.maxPartitionBytes"]) == 128 * 1024**2


def test_extra_conf_wins_last(monkeypatch):
    confs = _profile(
        monkeypatch,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "10m"},
    )
    # caller override must land after the profile lines
    assert confs["spark.sql.autoBroadcastJoinThreshold"] == "10m"
