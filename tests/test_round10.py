"""Round-10 lifecycle mechanics beyond the differential gate.

- sources/txn.py: the manifest-of-pointers commit protocol, exercised at
  every crash point (the driver round-trip only simulates one), plus the
  properties the round-trip doesn't cover: txn-id monotonicity, pointer
  carry-forward for tables outside a transaction, and one-cycle reader
  retention across a concurrent publish.
- streaming/ingest.publish_gold_version: the batch entry to the MVCC
  layout shares the streaming merge path; the GC contract (prune only
  after displacement, live pointer always listed) is re-checked here on
  synthetic frames so a regression is attributable without the driver.
"""

from __future__ import annotations

import os

import pytest

from f1_lakehouse_spark.sources.txn import (
    SimulatedCrash,
    manifest_read_table,
    publish_tables,
    read_manifest,
)


def _frames(spark, tag: int):
    a = spark.createDataFrame([(i, tag) for i in range(10)], "id int, tag int")
    b = spark.createDataFrame([(tag, 10)], "tag int, n int")
    return {"silver": a, "gold": b}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_txn_publish_and_snapshot_read(spark, tmp_path):
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    m = read_manifest(root)
    assert m["txn"] == 1
    assert set(m["tables"]) == {"silver", "gold"}
    assert _rows(manifest_read_table(spark, root, "silver", m)) == [
        (i, 1) for i in range(10)
    ]
    assert manifest_read_table(spark, root, "missing", m) is None


@pytest.mark.parametrize("crash_after", [1, 2])
def test_txn_crash_at_every_point_then_replay(spark, tmp_path, crash_after):
    """A crash after ANY prefix of the version-dir writes leaves the
    committed snapshot untouched; the replay completes the transaction."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    m1 = read_manifest(root)
    with pytest.raises(SimulatedCrash):
        publish_tables(
            spark, root, _frames(spark, 2), txn_id=2, fail_after_writes=crash_after
        )
    assert read_manifest(root) == m1
    # readers resolving through the manifest still see txn 1's content
    m = read_manifest(root)
    assert _rows(manifest_read_table(spark, root, "silver", m)) == [
        (i, 1) for i in range(10)
    ]
    publish_tables(spark, root, _frames(spark, 2), txn_id=2)
    m2 = read_manifest(root)
    assert m2["txn"] == 2
    assert _rows(manifest_read_table(spark, root, "silver", m2)) == [
        (i, 2) for i in range(10)
    ]


def test_txn_replay_after_commit_noops_and_regression_raises(spark, tmp_path):
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    publish_tables(spark, root, _frames(spark, 2), txn_id=2)
    m2 = read_manifest(root)
    # replay of the committed txn is a no-op (manifest byte-identical)
    publish_tables(spark, root, _frames(spark, 2), txn_id=2)
    assert read_manifest(root) == m2
    # an OLDER txn id is a protocol violation, not a silent overwrite
    with pytest.raises(ValueError, match="older"):
        publish_tables(spark, root, _frames(spark, 0), txn_id=1)


def test_txn_carries_forward_tables_outside_the_transaction(spark, tmp_path):
    """A txn touching only one table repoints that table and carries the
    other's pointer forward — the untouched table stays readable at its
    committed version through the new manifest."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    only_gold = {"gold": spark.createDataFrame([(9, 99)], "tag int, n int")}
    publish_tables(spark, root, only_gold, txn_id=2)
    m2 = read_manifest(root)
    assert m2["tables"]["gold"] == "v0000000002"
    assert m2["tables"]["silver"] == "v0000000001"
    assert _rows(manifest_read_table(spark, root, "silver", m2)) == [
        (i, 1) for i in range(10)
    ]
    assert _rows(manifest_read_table(spark, root, "gold", m2)) == [(9, 99)]


def test_txn_reader_survives_one_publish_cycle(spark, tmp_path):
    """One-cycle retention: a reader holding the txn-1 manifest still
    resolves after txn 2 commits; after txn 3 its versions are GC'd and
    resolution degrades to None (never a broken scan)."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    held = read_manifest(root)
    publish_tables(spark, root, _frames(spark, 2), txn_id=2)
    df = manifest_read_table(spark, root, "silver", held)
    assert df is not None and _rows(df) == [(i, 1) for i in range(10)]
    publish_tables(spark, root, _frames(spark, 3), txn_id=3)
    assert manifest_read_table(spark, root, "silver", held) is None


def test_publish_gold_version_gc_contract(spark, tmp_path):
    from f1_lakehouse_spark.streaming.ingest import (
        list_versions,
        publish_gold_version,
        read_gold,
    )

    gold = str(tmp_path / "gold")
    mk = lambda n: spark.createDataFrame(  # noqa: E731
        [("a", n)], "event_type string, n int"
    )
    publish_gold_version(mk(1), 1, gold)
    publish_gold_version(mk(2), 2, gold)
    assert list_versions(gold) == ["v0000000001", "v0000000002"]
    assert read_gold(spark, gold, version="v0000000001").count() == 1
    publish_gold_version(mk(3), 3, gold)
    assert list_versions(gold) == ["v0000000002", "v0000000003"]
    assert read_gold(spark, gold, version="v0000000001") is None
    # the live pointer always names a listed version
    with open(os.path.join(gold, "_CURRENT")) as f:
        assert f.read().strip() in list_versions(gold)
