"""Round-11 lifecycle mechanics beyond the differential gate.

- sources/txn.py hardening (r10 ADVICE): the final live-pointer swap is
  monotonic (a stalled winner resuming after being rolled forward can no
  longer rewind the snapshot), mixed writer-token mode raises loudly
  instead of silently degrading OCC race detection, publish_staged is
  crash-replay idempotent even after its branch was fast-forwarded, and
  manifest history is expirable with tag/branch pins.
- sources/mor.py hardening + upsert: fragment commits are O_EXCL-
  arbitrated (racing deletes can't overwrite each other), a commit
  displaced by a racing compaction is redone rather than silently lost,
  crash-orphaned staging dirs are swept, and latest-wins insert fragments
  give MERGE semantics in one atomic commit.
- sources/txn.table_changes(emit_pre_post=True): Delta-CDF row semantics
  (update_preimage/update_postimage) and the signed-delta identity an
  incremental consumer relies on.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from f1_lakehouse_spark.sources.txn import (
    MANIFEST,
    CommitConflictError,
    SimulatedCrash,
    create_tag,
    expire_history,
    fast_forward,
    publish_staged,
    publish_tables,
    read_manifest,
    read_ref,
    table_changes,
)


def _frames(spark, tag: int):
    a = spark.createDataFrame([(i, tag) for i in range(10)], "id int, tag int")
    b = spark.createDataFrame([(tag, 10)], "tag int, n int")
    return {"silver": a, "gold": b}


# ---------------------------------------------------------------------------
# txn.py: monotonic final swap / stalled-winner resume
# ---------------------------------------------------------------------------


def test_stalled_winner_cannot_rewind_live_pointer(spark, tmp_path):
    """The r10 ADVICE medium: winner W creates txn-2's commit record then
    stalls before its swap; loser L conflicts (rolling W forward to
    live=2) and retries as txn 3. When W resumes, its swap must be a
    no-op — the live pointer never moves backwards."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="w")
    # W stalls between its commit record and its live swap
    with pytest.raises(SimulatedCrash):
        publish_tables(
            spark, root, _frames(spark, 2), txn_id=2, writer="w",
            fail_after_record=True,
        )
    assert read_manifest(root)["txn"] == 1  # record exists, swap never ran
    # L conflicts on txn 2 and rolls W forward
    with pytest.raises(CommitConflictError):
        publish_tables(spark, root, _frames(spark, 99), txn_id=2, writer="l")
    assert read_manifest(root)["txn"] == 2
    # L retries with txn 3 and wins the timeline
    publish_tables(spark, root, _frames(spark, 3), txn_id=3, writer="l")
    m3 = read_manifest(root)
    assert m3["txn"] == 3
    # W resumes its crashed txn-2 publish: replay must no-op, never
    # presenting the stale txn-2 snapshot as live
    publish_tables(spark, root, _frames(spark, 2), txn_id=2, writer="w")
    assert read_manifest(root) == m3


def test_commit_manifest_swap_is_guarded_directly(spark, tmp_path):
    """Unit-level guard check: _commit_manifest invoked with a stale view
    of the world (the resume-inside-the-function case the API-level test
    can't reach) must not move the live pointer backwards."""
    from f1_lakehouse_spark.sources.txn import _commit_manifest

    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="w")
    cur1 = read_manifest(root)
    publish_tables(spark, root, _frames(spark, 2), txn_id=2, writer="w")
    publish_tables(spark, root, _frames(spark, 3), txn_id=3, writer="w")
    m3 = read_manifest(root)
    # stage txn-2's dirs again so the resumed commit has something to name
    frames = _frames(spark, 2)
    # a resumed txn-2 commit (guard was passed long ago, cur snapshot
    # stale) finds its own record and must SKIP the swap
    _commit_manifest(root, cur1, frames, 2, "w")
    assert read_manifest(root) == m3


# ---------------------------------------------------------------------------
# txn.py: mixed writer-token mode raises
# ---------------------------------------------------------------------------


def test_mixed_token_mode_raises(spark, tmp_path):
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="a")
    with pytest.raises(ValueError, match="mixed writer-token"):
        publish_tables(spark, root, _frames(spark, 2), txn_id=2)
    # tokened continuation is fine
    publish_tables(spark, root, _frames(spark, 2), txn_id=2, writer="b")
    # publish_staged is held to the same rule
    with pytest.raises(ValueError, match="mixed writer-token"):
        publish_staged(spark, root, _frames(spark, 3), txn_id=3, branch="wap")
    # untokened roots keep working untokened (single-writer mode)
    root2 = str(tmp_path / "m2")
    publish_tables(spark, root2, _frames(spark, 1), txn_id=1)
    publish_tables(spark, root2, _frames(spark, 2), txn_id=2)


# ---------------------------------------------------------------------------
# txn.py: publish_staged crash-replay idempotency
# ---------------------------------------------------------------------------


def test_publish_staged_replay_after_fast_forward_noops(spark, tmp_path):
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="etl")
    publish_staged(
        spark, root, _frames(spark, 2), txn_id=2, branch="wap", writer="etl"
    )
    live = fast_forward(root, "wap")
    assert live["txn"] == 2
    # the crash-replay of the staging arrives AFTER the fast-forward: its
    # own commit record proves the staging succeeded — no-op, not a
    # monotonicity ValueError
    publish_staged(
        spark, root, _frames(spark, 2), txn_id=2, branch="wap", writer="etl"
    )
    assert read_manifest(root) == live and read_ref(root, "wap") == 2
    # a later staging moves the branch on; a then-late replay of txn 2
    # must NOT rewind it
    publish_staged(
        spark, root, _frames(spark, 3), txn_id=3, branch="wap", writer="etl"
    )
    publish_staged(
        spark, root, _frames(spark, 2), txn_id=2, branch="wap", writer="etl"
    )
    assert read_ref(root, "wap") == 3
    # a DIFFERENT writer replaying that txn still conflicts
    with pytest.raises(CommitConflictError):
        publish_staged(
            spark, root, _frames(spark, 2), txn_id=2, branch="wap", writer="spy"
        )


# ---------------------------------------------------------------------------
# txn.py: manifest-history expiration
# ---------------------------------------------------------------------------


def test_expire_history_respects_pins_and_live(spark, tmp_path):
    root = str(tmp_path / "m")
    for t in (1, 2, 3, 4):
        publish_tables(spark, root, _frames(spark, t), txn_id=t, writer="w")
    create_tag(root, "audited-v2", 2)
    expired = expire_history(root, keep_n=1)
    # 4 is newest+live, 2 is tag-pinned; 1 and 3 expire
    assert expired == [1, 3]
    assert read_manifest(root, txn=2) is not None  # pinned record survives
    assert read_manifest(root, txn=1) is None
    assert read_manifest(root, txn=3) is None
    assert read_manifest(root)["txn"] == 4  # the live manifest is untouched
    # idempotent: nothing left to expire
    assert expire_history(root, keep_n=1) == []
    # keep_n=0 still keeps pins and the live record
    assert expire_history(root, keep_n=0) == []
    assert read_manifest(root, txn=4) is not None
    with pytest.raises(ValueError, match=">= 0"):
        expire_history(root, keep_n=-1)


def test_expire_history_branch_pin(spark, tmp_path):
    """A staged-branch record is pinned by its branch ref until the
    branch moves or is promoted."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="w")
    publish_staged(
        spark, root, _frames(spark, 2), txn_id=2, branch="wap", writer="w"
    )
    publish_tables(spark, root, _frames(spark, 3), txn_id=3, writer="w")
    # hold on to txn 3 (live+newest); txn 2 is branch-pinned; txn 1 expires
    assert expire_history(root, keep_n=1) == [1]
    assert read_manifest(root, txn=2) is not None


# ---------------------------------------------------------------------------
# mor.py: O_EXCL seq arbitration, displaced-commit redo, orphan sweep
# ---------------------------------------------------------------------------


def _mor_base(spark, tmp_path, name="t"):
    from f1_lakehouse_spark.sources.mor import mor_write_base

    tbl = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "id int, grp int"
    )
    mor_write_base(df, tbl)
    return tbl


def test_mor_seq_claim_burned_by_stale_lock(spark, tmp_path):
    """A crashed claim (orphan .lock) burns its seq: the next commit skips
    to the following seq instead of blocking or clobbering."""
    from f1_lakehouse_spark.sources.mor import _delete_files, mor_delete

    tbl = _mor_base(spark, tmp_path)
    ddir = os.path.join(tbl, "g0000000000", "deletes")
    os.makedirs(ddir)
    open(os.path.join(ddir, "d0000000001.parquet.lock"), "w").close()
    n = mor_delete(spark, tbl, "id", F.col("id") == 0)
    assert n == 1
    files = _delete_files(tbl, 0)
    assert [os.path.basename(p) for p in files] == ["d0000000002.parquet"]


def test_mor_commit_displaced_by_compaction_is_redone(spark, tmp_path):
    """A fragment commit that lands in a generation a racing compaction
    just displaced is removed and redone against the new live generation —
    the delete is never silently lost."""
    import f1_lakehouse_spark.sources.mor as mor

    tbl = _mor_base(spark, tmp_path)
    real_commit = mor._commit_fragment
    calls = {"n": 0}

    def racing_commit(table_dir, gen, sub, src):
        calls["n"] += 1
        if calls["n"] == 1:
            # compaction wins the race just before our rename lands
            mor.mor_compact(spark, table_dir, "id")
        return real_commit(table_dir, gen, sub, src)

    try:
        mor._commit_fragment = racing_commit
        n = mor.mor_delete(spark, tbl, "id", F.col("id") < 2)
    finally:
        mor._commit_fragment = real_commit
    assert n == 2
    assert calls["n"] == 2  # first commit displaced, second succeeded
    assert mor._live_gen(tbl) == 1
    # the displaced generation holds no orphan fragment
    assert mor._delete_files(tbl, 0) == []
    ids = {r["id"] for r in mor.mor_read(spark, tbl, "id").collect()}
    assert ids == set(range(2, 10))


def test_mor_staging_orphans_swept_by_compaction(spark, tmp_path):
    """Only STALE staging dirs are swept (age-gated): a compaction racing
    a live writer's in-flight staging must leave it alone."""
    import time

    from f1_lakehouse_spark.sources.mor import _STAGING_TTL_SECONDS, mor_compact

    tbl = _mor_base(spark, tmp_path)
    stale = os.path.join(tbl, "_staging_deadbeef")
    fresh = os.path.join(tbl, "_staging_cafebabe")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - _STAGING_TTL_SECONDS - 60
    os.utime(stale, (old, old))
    mor_compact(spark, tbl, "id")
    assert not os.path.isdir(stale)
    assert os.path.isdir(fresh)


# ---------------------------------------------------------------------------
# mor.py: upsert (latest-wins insert fragments)
# ---------------------------------------------------------------------------


def test_mor_upsert_update_insert_delete_reinsert(spark, tmp_path):
    from f1_lakehouse_spark.sources.mor import (
        _delete_files,
        _insert_files,
        base_dir,
        mor_compact,
        mor_delete,
        mor_read,
        mor_upsert,
    )

    tbl = _mor_base(spark, tmp_path)

    def view():
        return {r["id"]: r["grp"] for r in mor_read(spark, tbl, "id").collect()}

    base_census = sorted(os.listdir(base_dir(tbl)))
    # update id 3 (grp 99) + insert id 20 (grp 7) in ONE commit
    up = spark.createDataFrame([(3, 99), (20, 7)], "id int, grp int")
    assert mor_upsert(spark, tbl, "id", up) == 2
    got = view()
    assert got[3] == 99 and got[20] == 7 and len(got) == 11
    # base untouched (merge-on-read, not copy-on-write)
    assert sorted(os.listdir(base_dir(tbl))) == base_census
    # a later delete kills the upserted row (delete seq > insert seq)
    assert mor_delete(spark, tbl, "id", F.col("id").isin(3, 20)) == 2
    got = view()
    assert 3 not in got and 20 not in got and len(got) == 9
    # a later upsert re-inserts past the delete (insert seq > delete seq)
    assert mor_upsert(spark, tbl, "id", spark.createDataFrame([(20, 8)], "id int, grp int")) == 1
    got = view()
    assert got[20] == 8 and 3 not in got
    # stacked upserts: latest wins
    assert mor_upsert(spark, tbl, "id", spark.createDataFrame([(20, 9)], "id int, grp int")) == 1
    assert view()[20] == 9
    # compaction folds inserts AND deletes, content-identically
    pre = sorted(view().items())
    mor_compact(spark, tbl, "id")
    assert sorted(view().items()) == pre
    assert _delete_files(tbl, 1) == [] and _insert_files(tbl, 1) == []
    # pinned reader of the displaced generation reconstructs the same rows
    pinned = {r["id"]: r["grp"] for r in mor_read(spark, tbl, "id", gen=0).collect()}
    assert sorted(pinned.items()) == pre


def test_mor_upsert_rejects_duplicate_keys(spark, tmp_path):
    from f1_lakehouse_spark.sources.mor import mor_upsert

    tbl = _mor_base(spark, tmp_path)
    dup = spark.createDataFrame([(1, 5), (1, 6)], "id int, grp int")
    with pytest.raises(ValueError, match="unique keys"):
        mor_upsert(spark, tbl, "id", dup)
    # and no fragment was committed by the failed batch
    from f1_lakehouse_spark.sources.mor import _insert_files

    assert _insert_files(tbl, 0) == []


# ---------------------------------------------------------------------------
# txn.table_changes pre/post images
# ---------------------------------------------------------------------------


def test_table_changes_pre_post_images(spark, tmp_path):
    root = str(tmp_path / "m")
    schema = "user_id int, ts int, event_id int, payload string"
    old = spark.createDataFrame(
        [(1, 10, 100, "a"), (2, 20, 200, "b"), (3, 30, 300, None)], schema
    )
    new = spark.createDataFrame(
        [(1, 15, 150, "a2"), (3, 30, 300, None), (4, 40, 400, "d")], schema
    )
    publish_tables(spark, root, {"silver": old}, txn_id=1)
    publish_tables(spark, root, {"silver": new}, txn_id=2)
    cdf = table_changes(
        spark, root, "silver", 1, 2,
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        emit_pre_post=True,
    )
    got = sorted(
        (r["user_id"], r["_change_type"], r["ts"], r["payload"])
        for r in cdf.collect()
    )
    assert got == [
        (1, "update_postimage", 15, "a2"),
        (1, "update_preimage", 10, "a"),
        (2, "delete", 20, "b"),
        (4, "insert", 40, "d"),
    ]
    # the signed-delta identity an incremental consumer relies on:
    # old_agg + (post+insert) - (pre+delete) == new_agg
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cdf.agg(F.sum(sign * F.col("ts")).alias("d")).collect()[0]["d"]
    old_sum = old.agg(F.sum("ts")).collect()[0][0]
    new_sum = new.agg(F.sum("ts")).collect()[0][0]
    assert old_sum + delta == new_sum


# ---------------------------------------------------------------------------
# txn.py: ref-pinned version-dir retention + drop_ref
# ---------------------------------------------------------------------------


def test_tag_pins_version_dirs_until_dropped(spark, tmp_path):
    """A tag keeps its snapshot's version DIRS alive across any number of
    retention cycles (Iceberg tag retention); dropping the tag releases
    them to the next commit's retention pass."""
    from f1_lakehouse_spark.sources.txn import drop_ref, manifest_read_table

    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="w")
    create_tag(root, "keep", 1)
    for t in (2, 3, 4):
        publish_tables(spark, root, _frames(spark, t), txn_id=t, writer="w")
    # negative control: untagged txn-2 dirs aged out on the normal cycle
    assert (
        manifest_read_table(spark, root, "silver", read_manifest(root, txn=2))
        is None
    )
    # tagged txn-1 still fully readable, content-exact
    pinned = manifest_read_table(spark, root, "silver", read_manifest(root, txn=1))
    assert pinned is not None
    assert sorted(tuple(r) for r in pinned.collect()) == [
        (i, 1) for i in range(10)
    ]
    drop_ref(root, "keep")
    publish_tables(spark, root, _frames(spark, 5), txn_id=5, writer="w")
    assert (
        manifest_read_table(spark, root, "silver", read_manifest(root, txn=1))
        is None
    ), "dropped-tag versions still retained"
    with pytest.raises(ValueError, match="no such ref"):
        drop_ref(root, "keep")


def test_branch_pins_version_dirs_while_stale(spark, tmp_path):
    """A stale branch's staged version dirs survive mainline retention
    (r11 change — previously lost), so the audit can still read the
    staging right up until the rebase re-points the branch."""
    from f1_lakehouse_spark.sources.txn import (
        manifest_read_table,
        read_ref_manifest,
    )

    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="etl")
    publish_staged(
        spark, root, _frames(spark, 99), txn_id=2, branch="wap", writer="bot"
    )
    # mainline advances twice past the branch
    publish_tables(spark, root, _frames(spark, 3), txn_id=3, writer="etl")
    publish_tables(spark, root, _frames(spark, 4), txn_id=4, writer="etl")
    staged = read_ref_manifest(root, "wap")
    df = manifest_read_table(spark, root, "silver", staged)
    assert df is not None, "branch-pinned staging was pruned"
    assert sorted(tuple(r) for r in df.collect()) == [(i, 99) for i in range(10)]


# ---------------------------------------------------------------------------
# txn.py: orphan vacuum
# ---------------------------------------------------------------------------


def test_vacuum_orphans_classes_and_age_gate(spark, tmp_path):
    """Both orphan classes retention never catches are vacuumed (ahead-of-
    live txn ids, abandoned tables); reachable versions — live, displaced-
    but-history-referenced, ref-pinned — and fresh (in-TTL) stagings all
    survive."""
    from f1_lakehouse_spark.sources.txn import manifest_read_table, vacuum_orphans

    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="w")
    publish_tables(spark, root, _frames(spark, 2), txn_id=2, writer="w")
    # ahead-of-live orphan + abandoned-table orphan (crash before record)
    with pytest.raises(SimulatedCrash):
        publish_tables(
            spark, root, _frames(spark, 9), txn_id=9, writer="g",
            fail_after_writes=1,
        )
    with pytest.raises(SimulatedCrash):
        publish_tables(
            spark, root, {"scratch": _frames(spark, 3)["gold"]}, txn_id=3,
            writer="g", fail_after_writes=1,
        )
    ahead = os.path.join(root, "gold", "v0000000009-g")
    abandoned = os.path.join(root, "scratch", "v0000000003-g")
    assert os.path.isdir(ahead) and os.path.isdir(abandoned)
    # fresh (in-TTL) orphans survive: vacuum with a 1h TTL removes nothing
    assert vacuum_orphans(root) == []
    # age the two orphans past the TTL
    for p in (ahead, abandoned):
        old = os.path.getmtime(p) - 7200
        os.utime(p, (old, old))
    removed = vacuum_orphans(root)
    assert removed == sorted([ahead, abandoned])
    # reachable versions all survive: live + history-referenced displaced
    assert manifest_read_table(spark, root, "silver", read_manifest(root)) is not None
    assert (
        manifest_read_table(spark, root, "silver", read_manifest(root, txn=1))
        is not None
    )
    # idempotent
    assert vacuum_orphans(root) == []


# ---------------------------------------------------------------------------
# review fixes (r11): carry-forward, two-sided token guard, WAP loser
# cleanup, content-atomic exclusive creates
# ---------------------------------------------------------------------------


def test_mor_compaction_carries_forward_late_fragments(spark, tmp_path):
    """A fragment committed while the compaction's fold job is running
    (writer's pointer re-verify still sees the old pointer → reports
    success) must be carried forward into the new generation — the
    ordering the displaced-commit redo cannot catch."""
    import shutil as _sh

    import f1_lakehouse_spark.sources.mor as mor

    tbl = _mor_base(spark, tmp_path)
    mor.mor_delete(spark, tbl, "id", F.col("id") == 0)  # folded normally
    real_swap = mor._swap_pointer

    def swap_with_late_commit(table_dir, gen):
        # the racing writer's fragment lands AFTER the fold snapshot and
        # BEFORE the swap; its own re-verify passes (pointer still old)
        mor._swap_pointer = real_swap
        keys = spark.createDataFrame([(5,)], "id int")
        staging, part, _ = mor._stage_single_file(spark, keys, table_dir)
        assert mor._commit_fragment(table_dir, 0, "deletes", part) is True
        _sh.rmtree(staging, ignore_errors=True)
        real_swap(table_dir, gen)

    mor._swap_pointer = swap_with_late_commit
    try:
        mor.mor_compact(spark, tbl, "id")
    finally:
        mor._swap_pointer = real_swap
    assert mor._live_gen(tbl) == 1
    # the late delete was NOT lost: id 5 is suppressed in the new gen
    ids = {r["id"] for r in mor.mor_read(spark, tbl, "id").collect()}
    assert ids == set(range(1, 10)) - {5}, ids
    assert len(mor._delete_files(tbl, 1)) == 1  # carried fragment lives on


def test_mixed_token_mode_raises_tokened_on_untokened(spark, tmp_path):
    """The reverse direction: a TOKENED publish onto an untokened root
    would silently no-op on an equal-txn collision (the untokened record
    proves nothing about ownership) — it must raise instead."""
    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1)
    with pytest.raises(ValueError, match="mixed writer-token"):
        publish_tables(spark, root, _frames(spark, 2), txn_id=1, writer="b")
    with pytest.raises(ValueError, match="mixed writer-token"):
        publish_tables(spark, root, _frames(spark, 2), txn_id=2, writer="b")


def test_wap_loser_cleans_staging_on_conflict(spark, tmp_path):
    """write_audit_publish honors the same loser contract as
    publish_tables: losing the commit-record race must not leak the
    audited staging."""
    from f1_lakehouse_spark.sources.txn import write_audit_publish

    root = str(tmp_path / "m")
    publish_tables(spark, root, _frames(spark, 1), txn_id=1, writer="a")
    b_record = {
        "txn": 2,
        "tables": {"silver": "v0000000002-b", "gold": "v0000000002-b"},
        "writer": "b",
    }
    with open(os.path.join(root, f"{MANIFEST}.v{2:010d}"), "w") as f:
        json.dump(b_record, f)
    with pytest.raises(CommitConflictError):
        write_audit_publish(
            spark, root, _frames(spark, 9), 2, lambda staged: [], writer="a"
        )
    assert not os.path.isdir(os.path.join(root, "silver", "v0000000002-a"))
    assert not os.path.isdir(os.path.join(root, "gold", "v0000000002-a"))
    # the winner was still rolled forward
    assert read_manifest(root) == b_record


def test_create_exclusive_is_content_atomic(tmp_path):
    """The exclusive record create commits CONTENT atomically (link of a
    fully-written tmp): a second create fails, the first one's payload is
    complete, and no tmp litter remains."""
    from f1_lakehouse_spark.sources.txn import _create_exclusive

    path = str(tmp_path / "rec")
    _create_exclusive(path, '{"txn": 1}')
    assert json.load(open(path)) == {"txn": 1}
    with pytest.raises(FileExistsError):
        _create_exclusive(path, '{"txn": 99}')
    assert json.load(open(path)) == {"txn": 1}  # loser never clobbers
    assert [f for f in os.listdir(tmp_path) if ".tmp" in f] == []


# --- Bloom-filter runtime join filter (operators/joins.py) -------------------


def test_bloom_prefilter_prunes_and_is_sound(spark):
    from f1_lakehouse_spark.operators.joins import (
        bloom_filter_frame,
        bloom_prefilter,
    )

    fact = spark.range(0, 2000).select(F.col("id").alias("fk"))
    build = spark.createDataFrame(
        [(7,), (42,), (901,), (1500,), (1999,)], "bk bigint"
    )
    bloom = bloom_filter_frame(build, "bk", 5)
    pruned = bloom_prefilter(fact, "fk", bloom)
    kept = {r.fk for r in pruned.collect()}
    # soundness: every build key survives (no false negatives)
    assert {7, 42, 901, 1500, 1999} <= kept
    # effectiveness: with m=1024 bits for 5 keys, fp ~ 0 -> a strict
    # minority of the 2000 fact rows survives the map-side filter
    assert len(kept) < 2000 // 10, f"bloom kept {len(kept)} of 2000 rows"
    # the exact join behind the filter reproduces the plain join
    plain = sorted(
        r.fk for r in fact.join(build, fact["fk"] == build["bk"]).collect()
    )
    filtered = sorted(
        r.fk for r in pruned.join(build, pruned["fk"] == build["bk"]).collect()
    )
    assert plain == filtered == [7, 42, 901, 1500, 1999]


def test_bloom_prefilter_empty_build_empties_probe(spark):
    from f1_lakehouse_spark.operators.joins import (
        bloom_filter_frame,
        bloom_prefilter,
    )

    fact = spark.range(0, 50).select(F.col("id").alias("fk"))
    empty = spark.createDataFrame([], "bk bigint")
    bloom = bloom_filter_frame(empty, "bk", 1)
    # the 0-row bloom frame is the correct inner-join limit: no fact row
    # can match an empty build side, and the cross join encodes that
    assert bloom_prefilter(fact, "fk", bloom).count() == 0


# --- partition-spec evolution (sources/spec_evolution.py) --------------------


def test_spec_evolution_mechanics(spark, tmp_path):
    from f1_lakehouse_spark.sources.spec_evolution import (
        append_rows,
        create_table,
        evolve_spec,
        read_specs,
        read_table,
    )

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "k bigint, g string, d string"
    )
    assert create_table(spark, tbl, df, ["g"]) == 0
    with pytest.raises(ValueError, match="already exists"):
        create_table(spark, tbl, df)
    # evolving to the SAME spec no-ops; a new one bumps the id
    assert evolve_spec(tbl, ["g"]) == 0
    assert evolve_spec(tbl, ["d"]) == 1
    with pytest.raises(ValueError, match="not in table schema"):
        evolve_spec(tbl, ["nope"])
    # append resolves columns BY NAME against the frozen schema
    late = spark.createDataFrame(
        [("2024-01-03", 3, "c")], "d string, k bigint, g string"
    )
    assert append_rows(spark, tbl, late) == 1
    with pytest.raises(ValueError, match="schema mismatch"):
        append_rows(spark, tbl, late.drop("g"))
    got = sorted(tuple(r) for r in read_table(spark, tbl).collect())
    assert got == [
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-02"),
        (3, "c", "2024-01-03"),
    ]
    assert [s["spec_id"] for s in read_specs(tbl)["specs"]] == [0, 1]


def test_spec_evolution_empty_segment_skipped(spark, tmp_path):
    from f1_lakehouse_spark.sources.spec_evolution import (
        create_table,
        evolve_spec,
        read_table,
    )

    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "x")], "k bigint, g string")
    create_table(spark, tbl, df, [])
    # spec evolves but nothing is ever appended under it: the reader
    # must not fail on the missing segment
    evolve_spec(tbl, ["g"])
    assert [tuple(r) for r in read_table(spark, tbl).collect()] == [(1, "x")]


def test_spec_evolution_restores_frozen_types(spark, tmp_path):
    from f1_lakehouse_spark.sources.spec_evolution import (
        create_table,
        read_table,
    )

    tbl = str(tmp_path / "t")
    # date-shaped STRINGS as a partition column: hive dir inference would
    # deserialize them as DATE; the frozen schema casts them back
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "k bigint, d string"
    )
    create_table(spark, tbl, df, ["d"])
    back = read_table(spark, tbl)
    assert dict(back.dtypes)["d"] == "string"
    assert sorted(tuple(r) for r in back.collect()) == [
        (1, "2024-01-01"),
        (2, "2024-01-02"),
    ]
