"""Cross-table atomic publish: snapshot isolation across the medallion via
a manifest-of-pointers (r10).

The single-table MVCC layout (streaming/ingest.py:195-294) makes ONE
table's publish atomic — versioned dirs plus an atomic ``_CURRENT``
pointer swap. A real pipeline publishes silver AND gold together, and a
reader must never observe new gold over old silver (or vice versa). The
multi-table upgrade is the same idea one level up: a single root
``_MANIFEST`` file names every table's live version directory, and ONE
atomic manifest swap commits the whole transaction. This is the
transactional primitive Delta Lake's (legacy) multi-table transaction /
an Iceberg catalog's atomic multi-table commit provides; on plain parquet
the manifest file IS the catalog pointer.

Layout::

    root/_MANIFEST                   # JSON {"txn": N, "tables": {name: "v..."}}
    root/<table>/v0000000NNN/*.parquet

Commit protocol (``publish_tables``):

1. **Replay guard** — if the manifest's txn is already >= this txn id, the
   publish is a crash-replay AFTER a completed commit: no-op (the data is
   live; re-running would re-form read-write cycles for incremental
   tables).
2. **Write all version dirs** — each table's new frame lands in its own
   ``v{txn}`` directory, fully distributed, never touching any live dir.
   A crash anywhere in this phase (simulated by ``fail_after_writes``)
   leaves only ORPHAN directories: the manifest still names the previous
   versions of every table, so readers keep seeing the old consistent
   snapshot. The replay re-runs this phase overwriting its own orphans
   (disjoint from every live dir — safe).
3. **Atomic manifest swap** — write ``_MANIFEST.tmp``, ``os.replace``.
   Locally that is one atomic rename; on HDFS the same; on S3 a single
   pointer PUT. Tables not part of this transaction carry forward
   unchanged (their pointer entries are copied into the new manifest).
4. **Retention** — for each table in the txn, keep the new version, the
   version the outgoing manifest named (readers holding the old manifest
   survive one publish cycle, exactly like the single-table layout), and
   every version a ref (tag/branch) still resolves — a tagged snapshot
   stays fully readable until the tag is dropped; everything else older
   is pruned.

Snapshot isolation for readers: call :func:`read_manifest` ONCE and
resolve every table through that one dict (:func:`manifest_read_table`) —
all reads then come from the same committed transaction regardless of
concurrent publishes.

At 100 TB: the manifest is O(#tables) bytes — the commit cost is
independent of data volume; version-dir writes are ordinary distributed
parquet jobs; nothing here funnels data through the driver. Reference
parity: the reference rebuilds silver+gold as one ``dbt build``
(/root/reference/transform/dbt_project.yml:6-11) and gets cross-model
consistency only because the warehouse is a single-process DuckDB file —
this module is the distributed, crash-safe equivalent of that guarantee.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"


def _atomic_write(path: str, payload: str) -> None:
    """tmp-then-rename with a PER-WRITER tmp name: concurrent writers
    (an OCC winner's final swap racing a loser's roll-forward of the same
    record) sharing one tmp path can interleave open/truncate/replace —
    corrupting the staged bytes or crashing on the vanished tmp. A unique
    tmp makes every replace independent and atomic; ordering between
    same-target replaces is arbitrated by the callers' guards."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def _create_exclusive(path: str, payload: str) -> None:
    """Exclusive create WITH full content: write a unique tmp, then
    ``os.link(tmp, path)`` — the link is the atomic fail-if-exists commit
    point, so a concurrent reader can never observe an empty or partial
    record. (``O_CREAT|O_EXCL`` + a buffered write has exactly that torn
    window: the loser of a record race would ``json.load`` an empty file
    and crash with JSONDecodeError instead of the documented
    CommitConflictError.) Raises FileExistsError when ``path`` exists."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
    try:
        os.link(tmp, path)
    finally:
        os.remove(tmp)


class SimulatedCrash(RuntimeError):
    """Raised by the ``fail_after_writes`` test hook to emulate a process
    crash between a transaction's version-dir writes and its manifest
    swap. Production code never raises this."""


def read_manifest(root: str, txn: int | None = None) -> dict | None:
    """The committed transaction: ``{"txn": int, "tables": {name: version}}``,
    or None before the first publish. Read it ONCE per logical read and
    resolve all tables through the same dict — that is the snapshot.

    ``txn`` gives TIME TRAVEL: resolve the manifest history file a past
    commit wrote (``_MANIFEST.v{txn}``, immutable, O(#tables) bytes each —
    the history costs nothing at any data scale). The snapshot's version
    DIRS are only retained one publish cycle (see ``publish_tables``)
    unless a ref pins them, so an UNPINNED as-of read reaches exactly one
    commit back before :func:`manifest_read_table` starts degrading to
    None while a TAGGED snapshot stays fully readable until its tag is
    dropped — Iceberg's snapshot list with a short expire_snapshots
    horizon plus tag retention."""
    name = MANIFEST if txn is None else f"{MANIFEST}.v{txn:010d}"
    path = os.path.join(root, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def manifest_read_table(
    spark: SparkSession, root: str, name: str, manifest: dict | None
) -> DataFrame | None:
    """Resolve ``name`` through a manifest snapshot (from
    :func:`read_manifest`). None when the table is not in the snapshot or
    its version dir has been pruned (reader held the manifest for more
    than one publish cycle)."""
    if manifest is None or name not in manifest.get("tables", {}):
        return None
    vdir = os.path.join(root, name, manifest["tables"][name])
    if not os.path.isdir(vdir):
        return None
    return spark.read.parquet(vdir)


class CommitConflictError(RuntimeError):
    """Optimistic-concurrency conflict: another writer committed this
    txn id first. The loser must re-read the manifest, re-derive its
    frames against the new snapshot, and retry with the next txn id —
    exactly Delta/Iceberg's optimistic commit-retry loop."""


def _txn_guard(root: str, txn_id: int, writer: str | None) -> dict | str | None:
    """Shared replay/monotonicity/conflict guard. Returns the string
    "committed" when THIS writer's txn is already live (caller no-ops —
    the idempotent crash-replay), raises :class:`CommitConflictError`
    when a DIFFERENT writer won the race to this txn id (distinguishable
    only when both sides pass ``writer`` tokens; with no token the
    equal-txn case is treated as a replay, the pre-OCC behavior), and
    otherwise returns the current manifest (possibly None) to proceed."""
    cur = read_manifest(root)
    if cur is not None:
        _reject_mixed_token_mode(cur, writer)
        if cur["txn"] == txn_id:
            if writer is not None and cur.get("writer") not in (None, writer):
                raise CommitConflictError(
                    f"txn {txn_id} was committed by writer "
                    f"{cur.get('writer')!r}, not {writer!r} — re-read the "
                    "manifest and retry with the next txn id"
                )
            return "committed"
        if cur["txn"] > txn_id:
            # a replay of a txn this writer COMMITTED but that has since
            # been superseded must still no-op (the commit record proves
            # ownership); only a txn that never committed is a violation
            rec = read_manifest(root, txn=txn_id)
            if (
                rec is not None
                and not rec.get("staged")  # staged records never went live
                and (writer is None or rec.get("writer") == writer)
            ):
                return "committed"
            raise ValueError(
                f"txn_id {txn_id} is older than the committed {cur['txn']}"
            )
    return cur


def _reject_mixed_token_mode(cur: dict, writer: str | None) -> None:
    """Mixed writer-token mode is a silent footgun (CLAUDE.md txn rule),
    in BOTH directions: an UNTOKENED publish onto a tokened root treats
    any equal-txn collision as its own replay, and a TOKENED publish onto
    an untokened root no-ops on an equal-txn collision because the
    untokened record proves nothing about ownership — either way OCC race
    detection silently degrades exactly when it matters. Make it loud:
    the caller must pass ``writer=`` from every writer or from none."""
    if (writer is None) != (cur.get("writer") is None):
        have = cur.get("writer")
        raise ValueError(
            "mixed writer-token mode: the live manifest was committed "
            + (f"by writer {have!r}" if have is not None else "untokened")
            + " but this publish is "
            + ("untokened" if writer is None else f"tokened ({writer!r})")
            + " — OCC race detection would silently degrade; pass writer= "
            "tokens from EVERY writer or from none"
        )


def _stage_writes(
    root: str,
    tables: dict[str, DataFrame],
    version: str,
    fail_after_writes: int | None,
) -> None:
    """Phase 2 of the protocol: every table's new frame lands in its own
    version dir, distributed, never touching a live dir."""
    written = 0
    for name in sorted(tables):
        tables[name].write.mode("overwrite").parquet(
            os.path.join(root, name, version)
        )
        written += 1
        if fail_after_writes is not None and written >= fail_after_writes:
            raise SimulatedCrash(
                f"simulated crash after {written}/{len(tables)} writes"
            )


def _version_name(txn_id: int, writer: str | None) -> str:
    """Staged version dir for a txn. Writer-suffixed under OCC so two
    racing writers NEVER stage into the same directory — only the commit
    winner's dirs get referenced; the loser's are unreachable orphans
    (cleaned by its conflict handler, and by retention as a backstop)."""
    base = f"v{txn_id:010d}"
    return base if writer is None else f"{base}-{writer}"


def _commit_manifest(
    root: str,
    cur: dict | None,
    tables: dict[str, DataFrame],
    txn_id: int,
    writer: str | None,
    fail_after_record: bool = False,
) -> None:
    """Phases 3+4: atomic manifest swap (plus the immutable history copy
    for time travel / commit arbitration), then per-table one-cycle
    retention."""
    version = _version_name(txn_id, writer)
    prev_tables = dict(cur["tables"]) if cur else {}
    new_manifest = {
        "txn": txn_id,
        "tables": {**prev_tables, **{n: version for n in tables}},
    }
    if writer is not None:
        new_manifest["writer"] = writer
    # history copy FIRST — it doubles as the COMMIT ARBITRATION record.
    # With a writer token it is created EXCLUSIVELY (O_EXCL — the
    # fail-if-exists create is the one compare-and-swap primitive local
    # FS / HDFS give us, and it is exactly how Delta's _delta_log/N.json
    # commit arbitrates concurrent writers): the winner of the create IS
    # the committer of txn N. A loser finds the file owned by another
    # writer and raises; a crashed WINNER replaying finds its OWN record
    # and idempotently completes the live-pointer swap. Without a token
    # (single-writer mode) the history file is plain tmp+replace — a
    # crash between the two renames leaves a history file the replay's
    # rewrite makes identical, harmless.
    hist = os.path.join(root, f"{MANIFEST}.v{txn_id:010d}")
    payload = json.dumps(new_manifest)
    if writer is None:
        _atomic_write(hist, payload)
    else:
        try:
            _create_exclusive(hist, payload)
        except FileExistsError:
            with open(hist) as f:
                owner = json.load(f)
            if owner.get("staged"):
                # a BRANCH holds this txn id: its record is deliberately
                # unpromoted (write-audit-publish), not a crashed winner —
                # promoting it here would leak an unaudited staging to
                # every reader. Conflict regardless of who owns it; the
                # branch promotes itself via fast_forward.
                raise CommitConflictError(
                    f"txn {txn_id} is staged on a branch — fast_forward "
                    "the branch or retry with the next txn id"
                ) from None
            if owner.get("writer") != writer:
                # ROLL THE WINNER FORWARD before raising: the record IS
                # the commit (Delta semantics — the N.json wins; the live
                # pointer is derived state). If the winner crashed between
                # record and swap, every loser would otherwise re-derive
                # the SAME txn id against the stale manifest and conflict
                # forever; completing the swap on the winner's behalf
                # unblocks the retry loop and makes the record's txn
                # genuinely visible, so its time-travel snapshot is never
                # a phantom.
                live = read_manifest(root)
                if live is None or live["txn"] < owner["txn"]:
                    _atomic_write(os.path.join(root, MANIFEST), json.dumps(owner))
                raise CommitConflictError(
                    f"txn {txn_id} commit record is owned by writer "
                    f"{owner.get('writer')!r}, not {writer!r} — re-read "
                    "the manifest and retry with the next txn id"
                ) from None
            # our own crash leftover: fall through and complete the swap
            new_manifest = owner
    if fail_after_record:
        raise SimulatedCrash(
            f"simulated crash after txn {txn_id}'s commit record, before "
            "the live-pointer swap"
        )
    # the final swap is GUARDED the same way the loser's roll-forward is:
    # never move the live pointer backwards. Without the guard, a winner
    # that stalls between its commit record and its swap can be rolled
    # forward by a conflicting loser, which then commits txn N+1 — the
    # stalled winner resuming its unconditional swap would present the
    # stale txn N as live (a snapshot-monotonicity violation) until the
    # next write self-heals it. With the guard the resume is a no-op.
    live = read_manifest(root)
    if live is None or live["txn"] < new_manifest["txn"]:
        _atomic_write(os.path.join(root, MANIFEST), json.dumps(new_manifest))
    # retention: per table, the displaced version survives one cycle for
    # readers holding the outgoing manifest; everything STRICTLY OLDER is
    # pruned UNLESS a ref (tag/branch) pins it — a tagged snapshot stays
    # FULLY readable (manifest + dirs) until the tag is dropped, Iceberg's
    # tag-retention semantics (r11). Same-or-newer txn dirs are never
    # touched here — a concurrent OCC loser may still be mid-write into
    # its own v{txn}-{writer} dir, and rmtree-ing under a running Spark
    # job turns the documented CommitConflictError into an opaque executor
    # crash; the loser cleans its own stage on conflict, and the NEXT
    # commit's retention prunes anything it abandoned (by then strictly
    # older).
    pinned = _ref_pinned_versions(root)
    for name in tables:
        keep = {version, prev_tables.get(name)} | pinned.get(name, set())
        tdir = os.path.join(root, name)
        for entry in os.listdir(tdir):
            if not entry.startswith("v") or entry in keep:
                continue
            digits = entry[1:11]
            if digits.isdigit() and int(digits) >= txn_id:
                continue
            shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)


def _ref_pinned_versions(root: str) -> dict[str, set[str]]:
    """table -> version dirs some ref (tag or branch) still resolves:
    retention must not prune a version a NAMED snapshot can reach, or the
    reproducibility guarantee refs exist for silently breaks. Cost is
    O(#refs) metadata file reads per commit — independent of data volume."""
    pinned: dict[str, set[str]] = {}
    refs_dir = os.path.join(root, REFS_DIR)
    if not os.path.isdir(refs_dir):
        return pinned
    for name in os.listdir(refs_dir):
        if ".tmp" in name:  # in-flight unique tmps are not refs
            continue
        txn = read_ref(root, name)
        rec = None if txn is None else read_manifest(root, txn=txn)
        if rec is None:
            continue
        for tbl, ver in rec.get("tables", {}).items():
            pinned.setdefault(tbl, set()).add(ver)
    return pinned


def publish_tables(
    spark: SparkSession,
    root: str,
    tables: dict[str, DataFrame],
    txn_id: int,
    fail_after_writes: int | None = None,
    writer: str | None = None,
    fail_after_record: bool = False,
) -> None:
    """Atomically publish every frame in ``tables`` as transaction
    ``txn_id`` (see module docstring for the protocol). Idempotent under
    crash-replay; ``txn_id`` must be monotonically increasing across
    publishes to the same root.

    ``writer`` opts into optimistic concurrency: each writer stages into
    its own version dirs and the txn's commit record is created
    exclusively (fail-if-exists — the Delta _delta_log arbitration), so
    of N racing writers exactly ONE commits txn_id and every loser gets
    :class:`CommitConflictError` (re-read the manifest, re-derive, retry
    with the next id) with its orphan staging removed. Without a token
    the equal-txn case is treated as this writer's own replay —
    single-writer mode, the pre-OCC behavior."""
    os.makedirs(root, exist_ok=True)
    cur = _txn_guard(root, txn_id, writer)
    if cur == "committed":
        # crash-replay AFTER a completed commit: the transaction is
        # durable and live — the no-op IS the idempotent replay
        return
    version = _version_name(txn_id, writer)
    _stage_writes(root, tables, version, fail_after_writes)
    try:
        _commit_manifest(
            root, cur, tables, txn_id, writer, fail_after_record=fail_after_record
        )
    except CommitConflictError:
        for name in tables:  # lost the race: remove our unreachable stage
            shutil.rmtree(os.path.join(root, name, version), ignore_errors=True)
        raise


def write_audit_publish(
    spark: SparkSession,
    root: str,
    tables: dict[str, DataFrame],
    txn_id: int,
    audit_fn,
    clean_rejected: bool = True,
    writer: str | None = None,
) -> list[str]:
    """Write-Audit-Publish (the Iceberg WAP pattern; the scaled-up form of
    the reference's post-hoc gate `/root/reference/scripts/check_gold.sh`
    + dbt not_null tests, which only check AFTER the tables are live):
    stage every table's version dir, run ``audit_fn`` against the STAGED
    data read back from disk (what readers would actually see), and swap
    the manifest ONLY if the audit returns no violations — a failing batch
    never becomes visible to any reader.

    ``audit_fn(staged: dict[str, DataFrame]) -> list[str]`` returns
    human-readable violation strings (empty = pass). Returns the violation
    list; on rejection the staged orphan dirs are removed (unless
    ``clean_rejected=False`` — keep them for debugging) and the committed
    snapshot is untouched. Idempotent like ``publish_tables``: a replay of
    an already-committed txn no-ops (returns [])."""
    os.makedirs(root, exist_ok=True)
    cur = _txn_guard(root, txn_id, writer)
    if cur == "committed":
        return []
    version = _version_name(txn_id, writer)
    _stage_writes(root, tables, version, None)
    staged = {
        name: spark.read.parquet(os.path.join(root, name, version))
        for name in tables
    }
    violations = list(audit_fn(staged))
    if violations:
        if clean_rejected:
            for name in tables:
                shutil.rmtree(
                    os.path.join(root, name, version), ignore_errors=True
                )
        return violations
    try:
        _commit_manifest(root, cur, tables, txn_id, writer)
    except CommitConflictError:
        # same loser contract as publish_tables: a WAP writer that loses
        # the commit-record race must not leak its audited staging
        for name in tables:
            shutil.rmtree(os.path.join(root, name, version), ignore_errors=True)
        raise
    return []


def table_changes(
    spark: SparkSession,
    root: str,
    name: str,
    from_txn: int,
    to_txn: int,
    key_cols: list[str],
    order_cols: list[str],
    emit_pre_post: bool = False,
) -> DataFrame:
    """Change Data Feed between two committed snapshots (Delta CDF /
    Iceberg changelog, derived rather than stored): resolve ``name`` at
    both transactions through their immutable history manifests, full-
    outer-join on the key, and classify every key as insert (new only),
    delete (old only), or update (both present and the ``order_cols``
    version tuple differs — for latest-per-key tables that tuple ends in
    a unique tiebreaker, so it differs IFF the row changed). Unchanged
    keys are omitted. Returns the new row's columns (the old row's for
    deletes) plus ``_change_type``.

    ``emit_pre_post=True`` switches to Delta-CDF row semantics: every
    update emits TWO rows — ``update_preimage`` (the old row) and
    ``update_postimage`` (the new row) — so a downstream consumer can
    incrementally maintain an aggregate by SUBTRACTING preimages/deletes
    and ADDING postimages/inserts, without a second snapshot read. The
    explode is per-changed-key, so the feed stays delta-proportional.

    Cost: one key-shuffle full-outer join of two entity-bounded
    snapshots — no log replay, no stored change files; the manifests
    pin which version dirs to diff. Downstream incremental consumers
    (sync a mart, invalidate a cache, feed a stream) read the diff
    instead of re-scanning the table. Both snapshots must still be
    within version-dir retention (one publish cycle by default)."""
    old = manifest_read_table(spark, root, name, read_manifest(root, txn=from_txn))
    new = manifest_read_table(spark, root, name, read_manifest(root, txn=to_txn))
    if old is None or new is None:
        raise ValueError(
            f"snapshot missing or pruned for {name!r} at txn "
            f"{from_txn if old is None else to_txn}"
        )
    return snapshot_diff(old, new, key_cols, order_cols, emit_pre_post)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    emit_pre_post: bool = False,
) -> DataFrame:
    """The DataFrame-level diff :func:`table_changes` is built on — same
    classification and row semantics, but over two frames the caller
    already holds (e.g. a streaming micro-batch's previous-vs-merged
    silver, where the new state is not committed yet)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    data_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_old_{c}") for c in data_cols]
    )
    n_ = new.select(*key_cols, *data_cols)
    joined = o.join(n_, key_cols, "full_outer")
    # presence must be decided on a never-NULL marker, not a payload
    # column: use the order tuple's unique tail, which every row carries
    tiebreak = order_cols[-1]
    is_new = F.col(tiebreak).isNotNull()
    is_old = F.col(f"_old_{tiebreak}").isNotNull()
    changed = F.struct(*[F.col(c) for c in order_cols]) != F.struct(
        *[F.col(f"_old_{c}") for c in order_cols]
    )
    change_type = (
        F.when(is_new & ~is_old, F.lit("insert"))
        .when(is_old & ~is_new, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    classified = joined.withColumn("_change_type", change_type).filter(
        F.col("_change_type").isNotNull()
    )
    if emit_pre_post:
        # Delta-CDF row semantics: one (change_type, row) variant for
        # inserts/deletes, TWO for updates (preimage + postimage), exploded
        # per changed key — the feed is an exact signed delta of the table
        old_struct = F.struct(*[F.col(f"_old_{c}").alias(c) for c in data_cols])
        new_struct = F.struct(*[F.col(c).alias(c) for c in data_cols])
        ct = F.col("_change_type")
        variants = (
            F.when(
                ct == "insert",
                F.array(
                    F.struct(F.lit("insert").alias("t"), new_struct.alias("r"))
                ),
            )
            .when(
                ct == "delete",
                F.array(
                    F.struct(F.lit("delete").alias("t"), old_struct.alias("r"))
                ),
            )
            .otherwise(
                F.array(
                    F.struct(
                        F.lit("update_preimage").alias("t"),
                        old_struct.alias("r"),
                    ),
                    F.struct(
                        F.lit("update_postimage").alias("t"),
                        new_struct.alias("r"),
                    ),
                )
            )
        )
        exploded = classified.select(*key_cols, F.explode(variants).alias("_v"))
        return exploded.select(
            *key_cols,
            *[F.col(f"_v.r.{c}").alias(c) for c in data_cols],
            F.col("_v.t").alias("_change_type"),
        )
    # the output row is chosen PER ROW by change type (old row for
    # deletes, new row otherwise), never per column: a per-column
    # coalesce would resurrect the OLD value whenever an update
    # legitimately NULLs a field, feeding stale data to incremental
    # consumers
    is_delete = F.col("_change_type") == "delete"
    out_cols = [
        F.when(is_delete, F.col(f"_old_{c}")).otherwise(F.col(c)).alias(c)
        for c in data_cols
    ]
    return classified.select(*key_cols, *out_cols, "_change_type")


# ---------------------------------------------------------------------------
# Refs: branches and tags over the manifest history (Iceberg refs / Delta
# does not have these; the branch-WAP flow is Iceberg's
# stage-on-branch -> audit -> fast-forward-main pattern)
# ---------------------------------------------------------------------------

REFS_DIR = "_refs"


class StaleBranchError(RuntimeError):
    """fast_forward target is not ahead of the live manifest: main has
    advanced past the branch. The branch must rebase — re-derive its
    frames against the new live snapshot and re-stage at a fresh txn id
    (Iceberg's publish-conflict outcome for WAP branches)."""


def _ref_path(root: str, name: str) -> str:
    return os.path.join(root, REFS_DIR, name)


def read_ref(root: str, name: str) -> int | None:
    """The txn id a ref names, or None."""
    path = _ref_path(root, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(f.read().strip())


def create_tag(root: str, name: str, txn_id: int) -> None:
    """An IMMUTABLE named pointer to a committed txn (audit marker,
    reproducibility pin). Write-once: re-tagging an existing name is an
    error, never a silent move."""
    if read_manifest(root, txn=txn_id) is None:
        raise ValueError(f"cannot tag txn {txn_id}: no commit record")
    os.makedirs(os.path.join(root, REFS_DIR), exist_ok=True)
    # exists -> FileExistsError: tags never move; content-atomic so a
    # concurrent read_ref never sees a half-written id
    _create_exclusive(_ref_path(root, name), str(txn_id))


def drop_ref(root: str, name: str) -> None:
    """Remove a tag or branch. The versions only this ref pinned become
    prunable at the NEXT commit's retention pass, and its history record
    becomes expirable (Iceberg: dropping a tag releases its snapshot to
    expire_snapshots). Loud on a missing ref — silently 'dropping' a typo
    would leave the real pin in place."""
    path = _ref_path(root, name)
    if not os.path.exists(path):
        raise ValueError(f"no such ref: {name!r}")
    os.remove(path)


def _set_branch(root: str, name: str, txn_id: int) -> None:
    os.makedirs(os.path.join(root, REFS_DIR), exist_ok=True)
    _atomic_write(_ref_path(root, name), str(txn_id))


def read_ref_manifest(root: str, name: str) -> dict | None:
    """Resolve a ref to its manifest snapshot (tags and branches alike);
    feed the result to :func:`manifest_read_table`."""
    txn = read_ref(root, name)
    return None if txn is None else read_manifest(root, txn=txn)


def publish_staged(
    spark: SparkSession,
    root: str,
    tables: dict[str, DataFrame],
    txn_id: int,
    branch: str,
    writer: str | None = None,
) -> None:
    """Stage a transaction on a BRANCH without making it live: version
    dirs + commit record are written exactly like :func:`publish_tables`
    (the record carries ``staged: true``), the branch ref moves to it,
    but the live ``_MANIFEST`` is untouched — main readers cannot see it.
    Audit the branch via :func:`read_ref_manifest`, then
    :func:`fast_forward` main. A mainline writer racing to the same txn
    id gets a CommitConflictError, and the roll-forward helper explicitly
    REFUSES to promote a staged record (promoting an unaudited staging
    would defeat the entire WAP gate)."""
    os.makedirs(root, exist_ok=True)
    cur = read_manifest(root)
    if cur is not None:
        _reject_mixed_token_mode(cur, writer)
    # the writer's OWN record is checked BEFORE the ahead-of-live guard:
    # a crash-replay of a staging whose branch has since been
    # fast-forwarded (or superseded) finds cur['txn'] >= txn_id, but its
    # own commit record proves the staging succeeded — the replay must
    # no-op/re-point, mirroring _txn_guard's superseded-replay path, not
    # die on the monotonicity check.
    rec = read_manifest(root, txn=txn_id)
    if rec is not None:
        if (
            not rec.get("staged")
            or writer is None
            or rec.get("writer") != writer
        ):
            raise CommitConflictError(
                f"txn {txn_id} commit record already exists (writer "
                f"{rec.get('writer')!r}) — re-read and retry with the "
                "next txn id"
            )
        # idempotent replay: re-point the branch — but never REWIND one
        # that has since advanced to a newer staging
        ref = read_ref(root, branch)
        if ref is None or ref < txn_id:
            _set_branch(root, branch, txn_id)
        return
    if cur is not None and cur["txn"] >= txn_id:
        raise ValueError(
            f"staged txn_id {txn_id} is not ahead of the live {cur['txn']}"
        )
    version = _version_name(txn_id, writer)
    _stage_writes(root, tables, version, None)
    prev_tables = dict(cur["tables"]) if cur else {}
    record = {
        "txn": txn_id,
        "tables": {**prev_tables, **{n: version for n in tables}},
        "staged": True,
    }
    if writer is not None:
        record["writer"] = writer
    hist = os.path.join(root, f"{MANIFEST}.v{txn_id:010d}")
    try:
        _create_exclusive(hist, json.dumps(record))
    except FileExistsError:
        for name in tables:
            shutil.rmtree(os.path.join(root, name, version), ignore_errors=True)
        raise CommitConflictError(
            f"lost the record race for staged txn {txn_id} — re-read and "
            "retry with the next txn id"
        ) from None
    _set_branch(root, branch, txn_id)


def fast_forward(root: str, branch: str) -> dict:
    """Promote a branch's staged txn to the live manifest — the publish
    half of branch-WAP, ONE atomic pointer swap. Refuses when main has
    advanced to or past the branch txn (:class:`StaleBranchError` — the
    branch must rebase); never moves main backwards. Returns the now-live
    manifest."""
    txn = read_ref(root, branch)
    if txn is None:
        raise ValueError(f"no such branch: {branch!r}")
    record = read_manifest(root, txn=txn)
    if record is None:
        raise ValueError(f"branch {branch!r} names txn {txn} with no record")
    live = read_manifest(root)
    if live is not None and live["txn"] >= record["txn"]:
        raise StaleBranchError(
            f"main is at txn {live['txn']}, branch {branch!r} at "
            f"{record['txn']} — rebase the branch onto the live snapshot"
        )
    promoted = {k: v for k, v in record.items() if k != "staged"}
    _atomic_write(os.path.join(root, MANIFEST), json.dumps(promoted))
    return promoted


def vacuum_orphans(root: str, ttl_seconds: float = 3600.0) -> list[str]:
    """Iceberg ``remove_orphan_files`` analog: delete version dirs NO
    manifest can reach — not the live manifest, not any ref's record, not
    any retained history record. Per-commit retention never catches two
    orphan classes: a crashed writer's staging whose txn id is AHEAD of
    the live txn (retention only prunes strictly-older dirs), and
    abandoned stagings of tables no later transaction touches. Both
    accumulate forever without this pass.

    ``ttl_seconds`` age-gates the delete: a dir younger than the TTL may
    be a RACING writer's in-flight staging (its commit record does not
    exist yet) — vacuuming it would turn a benign OCC race into a lost
    write, the same hazard the MoR staging sweep guards against. Run
    with ``expire_history(keep_n >= 2)``: the displaced snapshot's
    versions are referenced ONLY by the previous history record, so
    keep_n=1 (live record alone) would make them vacuum-eligible and
    break the one-publish-cycle reader guarantee. Returns removed paths.
    Cost: O(#history + #dirs) metadata reads — zero data I/O."""
    import time  # noqa: PLC0415

    referenced: set[tuple[str, str]] = set()
    live = read_manifest(root)
    manifests = [] if live is None else [live]
    prefix = MANIFEST + ".v"
    for f in os.listdir(root):
        if f.startswith(prefix) and f[len(prefix):].isdigit():
            rec = read_manifest(root, txn=int(f[len(prefix):]))
            if rec is not None:
                manifests.append(rec)
    for rec in manifests:
        for tbl, ver in rec.get("tables", {}).items():
            referenced.add((tbl, ver))
    horizon = time.time() - ttl_seconds
    removed: list[str] = []
    for tbl in os.listdir(root):
        tdir = os.path.join(root, tbl)
        if tbl.startswith("_") or not os.path.isdir(tdir):
            continue
        for entry in os.listdir(tdir):
            if not entry.startswith("v") or (tbl, entry) in referenced:
                continue
            path = os.path.join(tdir, entry)
            try:
                stale = os.path.getmtime(path) < horizon
            except OSError:
                continue  # vanished concurrently: its writer is cleaning up
            if stale:
                shutil.rmtree(path, ignore_errors=True)
                removed.append(path)
    return sorted(removed)


def expire_history(root: str, keep_n: int) -> list[int]:
    """Expire old ``_MANIFEST.v{N}`` history files — the Iceberg
    ``expire_snapshots`` analog for the manifest layer. Each history file
    is O(#tables) bytes, so data volume is irrelevant; what grows
    unboundedly is the FILE COUNT at real commit rates (one txn per
    streaming micro-batch, streaming/ingest.py), and time-travel reads
    degrade to None after one version-dir retention cycle anyway, so old
    history is dead weight.

    Keeps: the newest ``keep_n`` records, every record PINNED by a ref
    (tag or branch — expiring a pinned snapshot would silently break the
    reproducibility guarantee tags exist for), and the live manifest's
    own record. The live ``_MANIFEST`` file itself is never a candidate.
    Returns the expired txn ids (ascending)."""
    if keep_n < 0:
        raise ValueError(f"keep_n must be >= 0, got {keep_n}")
    pinned: set[int] = set()
    refs_dir = os.path.join(root, REFS_DIR)
    if os.path.isdir(refs_dir):
        for name in os.listdir(refs_dir):
            if ".tmp" in name:  # in-flight unique tmps are not refs
                continue
            txn = read_ref(root, name)
            if txn is not None:
                pinned.add(txn)
    live = read_manifest(root)
    if live is not None:
        pinned.add(live["txn"])
    prefix = MANIFEST + ".v"
    history = sorted(
        int(f[len(prefix):])
        for f in os.listdir(root)
        if f.startswith(prefix) and f[len(prefix):].isdigit()
    )
    keep = set(history[len(history) - keep_n:]) if keep_n else set()
    expired: list[int] = []
    for txn in history:
        if txn in keep or txn in pinned:
            continue
        os.remove(os.path.join(root, f"{MANIFEST}.v{txn:010d}"))
        expired.append(txn)
    return expired
