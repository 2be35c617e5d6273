"""Durable-checkpoint mode (round-5 verdict Next #6): every lineage-cut in
the package goes through `materialize()`, which defaults to
localCheckpoint() (fast, executor-local) and switches to reliable
checkpoint() into a configured directory when
`spark.graft.durableCheckpoint` is set — the cluster-safe variant that
survives executor loss. These tests pin that the switch changes WHERE the
materialized blocks live and nothing else: identical results, and real
files in the checkpoint dir."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("qname", ["minhash_near_dups", "semantic_dedup_drops"])
def test_durable_checkpoint_results_identical(spark, sf_dir, tmp_path, qname):
    """A checkpoint-heavy banded-join query and the checkpoint-dense
    semantic-dedup chain must return identical rows in both modes, and
    durable mode must actually write RDD checkpoint files under the
    configured directory. (hierarchy_paths held the second seat until
    round 9's suffix-closure rework removed every materialization
    boundary from its broadcast branch — nothing left to exercise.)"""
    q = entrymod.queries()[qname]
    default_rows = _rows(q(spark, sf_dir))

    ckpt_dir = str(tmp_path / "ckpts")
    spark.conf.set("spark.graft.durableCheckpoint", "true")
    spark.conf.set("spark.graft.checkpointDir", ckpt_dir)
    try:
        durable_rows = _rows(q(spark, sf_dir))
    finally:
        spark.conf.set("spark.graft.durableCheckpoint", "false")

    assert durable_rows == default_rows
    assert default_rows, "degenerate: query returned no rows"
    written = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(ckpt_dir)
        for f in fn
    ]
    assert written, "durable mode wrote no checkpoint files"


def test_durable_flag_env_fallback(spark, tmp_path, monkeypatch):
    """Without the spark.conf key, the env var drives the mode — the
    knob a cluster submit script would set."""
    from scripts_toolkit_spark.materialize import _durable_requested

    spark.conf.unset("spark.graft.durableCheckpoint")
    monkeypatch.delenv("SPARK_GRAFT_DURABLE_CHECKPOINT", raising=False)
    assert not _durable_requested(spark)
    monkeypatch.setenv("SPARK_GRAFT_DURABLE_CHECKPOINT", "1")
    assert _durable_requested(spark)
