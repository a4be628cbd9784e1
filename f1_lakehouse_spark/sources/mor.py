"""Merge-on-read (MoR) equality deletes and upserts on plain parquet
(r10; upsert + concurrent-writer arbitration r11).

The r9 row-level delete (sources/parquet_io.delete_rows_partition_scoped)
is COPY-ON-WRITE: the affected partitions are rewritten at delete time —
right when deletes are rare and reads are hot. Merge-on-read is the other
side of that trade (Iceberg v2 equality-delete files, Delta deletion
vectors): a delete commits as a tiny KEY FILE, an upsert as a tiny ROW
FILE, the base data files are never touched, and every reader applies the
accumulated fragments until a compaction folds them in. At 100 TB a GDPR
delete of one user cohort is then an O(matched-keys) write instead of a
partition rewrite, at the price of a per-read anti-join whose build side
is the (bounded) fragment set.

Layout — one GENERATION directory per compaction epoch, selected by a
pointer file (the same atomic-swap discipline as the MVCC/manifest
layers; two chained directory renames are NOT atomic and would leave a
window with no base at all)::

    table_dir/_BASE                          # names the live generation
    table_dir/g{gen}/base/*.parquet          # immutable data files (seq 0)
    table_dir/g{gen}/deletes/d{seq}.parquet  # one key file per delete
    table_dir/g{gen}/inserts/i{seq}.parquet  # one row file per upsert

Sequence semantics (Iceberg v2 sequence numbers, simplified): base rows
carry seq 0; every committed fragment claims the next seq (shared across
deletes and inserts, starting at 1). A delete file at seq s suppresses
every row whose seq is < s with a matching key; an insert file's rows
shadow every LOWER-seq row with the same key (latest-wins upsert), so an
upsert is ONE atomic file commit — no delete-file companion whose torn
half could publish a partial MERGE.

Concurrent writers: a fragment commit claims its seq via an O_EXCL
``.lock`` create (the same fail-if-exists arbitration txn.py uses for
commit records) — two racing deletes can never silently overwrite one
another's key file; the loser of a seq claim retries with the next seq.
After the rename the writer re-verifies the generation pointer: a commit
that raced a compaction landed in a displaced generation (invisible to
live readers), so it removes the orphan and redoes the operation against
the new live generation. The OTHER ordering — the commit lands while the
compaction's fold job is already running, so the writer's re-verify still
sees the old pointer — is covered by the compaction's post-swap
CARRY-FORWARD sweep: fragments committed after the fold's snapshot are
moved into the new generation in sequence order. Between the two, a
delete is never silently lost to a racing compaction. Crash-orphaned
``_staging_*`` dirs are swept by the next compaction's retention pass.

Delete files belong to their generation: a reader holding the old
pointer mid-compaction still sees (old base + old fragments) — the same
rows as the new compacted base — and the displaced generation survives
one compaction cycle before being pruned, exactly like every other
versioned layout in this package.

Reference parity: the reference has no delete/update path at all (bronze
is append-only, silver/gold are full rebuilds —
/root/reference/ingestion/src/ingestion/utils.py:36-44); both delete
strategies are the lakehouse capabilities a 100 TB deployment adds on
top. Delta/Iceberg equivalent: ``DELETE FROM t WHERE ...`` / ``MERGE
INTO`` with merge-on-read table properties.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

POINTER = "_BASE"

_FRAGMENT_RE = re.compile(r"^([di])(\d{10})\.parquet(\.lock)?$")

# a fragment commit retries when a racing compaction moves the generation
# pointer mid-commit; compactions are rare maintenance ops, so more than a
# handful of consecutive displacements means something is pathologically
# wrong — fail loudly instead of spinning
_MAX_COMMIT_RETRIES = 10


def _gen_name(gen: int) -> str:
    return f"g{gen:010d}"


def _size_or_zero(path: str) -> int:
    try:
        return os.path.getsize(path)
    except FileNotFoundError:  # vanished under a racing commit/compaction
        return 0


def _live_gen(table_dir: str) -> int:
    with open(os.path.join(table_dir, POINTER)) as f:
        return int(f.read().strip().lstrip("g"))


def _swap_pointer(table_dir: str, gen: int) -> None:
    ptr = os.path.join(table_dir, POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(_gen_name(gen))
    os.replace(tmp, ptr)


def base_dir(table_dir: str) -> str:
    """The live generation's base directory (for file-level audits)."""
    return os.path.join(table_dir, _gen_name(_live_gen(table_dir)), "base")


def mor_write_base(df: DataFrame, table_dir: str) -> None:
    """Materialize generation 0 and point the table at it."""
    os.makedirs(table_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(
        os.path.join(table_dir, _gen_name(0), "base")
    )
    _swap_pointer(table_dir, 0)


def _fragments(table_dir: str, gen: int, sub: str) -> list[tuple[int, str]]:
    """Committed fragment files under g{gen}/{sub} as (seq, path),
    seq-ascending. ``.lock`` claims are not fragments."""
    fdir = os.path.join(table_dir, _gen_name(gen), sub)
    if not os.path.isdir(fdir):
        return []
    out = []
    for f in os.listdir(fdir):
        m = _FRAGMENT_RE.match(f)
        if m and not m.group(3):
            out.append((int(m.group(2)), os.path.join(fdir, f)))
    return sorted(out)


def _delete_files(table_dir: str, gen: int) -> list[str]:
    return [p for _, p in _fragments(table_dir, gen, "deletes")]


def _insert_files(table_dir: str, gen: int) -> list[str]:
    return [p for _, p in _fragments(table_dir, gen, "inserts")]


def _next_seq(table_dir: str, gen: int) -> int:
    """Next free sequence number, shared across deletes and inserts (base
    rows are seq 0, so fragments start at 1). ``.lock`` claims count too:
    a crashed claim BURNS its seq rather than blocking it forever."""
    top = 0
    for sub in ("deletes", "inserts"):
        fdir = os.path.join(table_dir, _gen_name(gen), sub)
        if not os.path.isdir(fdir):
            continue
        for f in os.listdir(fdir):
            m = _FRAGMENT_RE.match(f)
            if m:
                top = max(top, int(m.group(2)))
    return top + 1


def _commit_fragment(table_dir: str, gen: int, sub: str, src: str) -> bool:
    """Claim the next seq in generation ``gen`` via an O_EXCL lock, move
    the staged parquet file in atomically, then re-verify the generation
    pointer. Returns False when a racing compaction displaced the
    generation mid-commit (the orphan fragment is removed; the caller
    redoes the operation against the new live generation)."""
    prefix = "d" if sub == "deletes" else "i"
    fdir = os.path.join(table_dir, _gen_name(gen), sub)
    os.makedirs(fdir, exist_ok=True)
    while True:
        seq = _next_seq(table_dir, gen)
        name = f"{prefix}{seq:010d}.parquet"
        lock = os.path.join(fdir, name + ".lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            continue  # another writer claimed this seq: take the next
        target = os.path.join(fdir, name)
        os.replace(src, target)  # atomic; readers never list a half file
        os.remove(lock)
        if _live_gen(table_dir) == gen:
            return True
        # a compaction displaced this generation between our pointer read
        # and the rename: the fragment is invisible to live readers and
        # would be pruned — remove it and let the caller redo. If the
        # remove finds it GONE, the compaction's carry-forward sweep
        # already moved it into the new live generation: the commit is
        # durable, report success instead of redoing it.
        try:
            os.remove(target)
        except FileNotFoundError:
            return True
        return False


_STAGING_TTL_SECONDS = 3600.0


def _carry_fragment_forward(
    table_dir: str, new_gen: int, sub: str, path: str
) -> None:
    """Move a fragment a racing writer committed into the displaced
    generation (after the fold's snapshot) into ``new_gen`` under a fresh
    claimed seq. No pointer re-verify and no delete-on-displacement: if
    yet another compaction displaces ``new_gen`` mid-carry, ITS
    carry-forward sweep moves the fragment again — the fragment is never
    dropped. Racing the writer's own displaced-commit cleanup is benign:
    whoever loses the rename/remove race sees FileNotFoundError and the
    fragment survives exactly once (the writer treats a vanished target
    as carried-forward success)."""
    prefix = "d" if sub == "deletes" else "i"
    fdir = os.path.join(table_dir, _gen_name(new_gen), sub)
    os.makedirs(fdir, exist_ok=True)
    while True:
        seq = _next_seq(table_dir, new_gen)
        name = f"{prefix}{seq:010d}.parquet"
        lock = os.path.join(fdir, name + ".lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            continue
        try:
            os.replace(path, os.path.join(fdir, name))
        except FileNotFoundError:
            # the writer's displaced-commit cleanup removed the source
            # first; its redo re-commits against the live generation
            pass
        os.remove(lock)
        return


def _sweep_staging_orphans(table_dir: str) -> None:
    """Remove ``_staging_*`` dirs a crashed fragment commit abandoned.
    Run from compaction's retention pass, and AGE-GATED: a staging dir is
    only an orphan once it is older than any plausible in-flight write —
    a compaction racing a live delete/upsert must not eat its staging
    mid-commit (that would turn a benign race into a failed write)."""
    import time  # noqa: PLC0415

    horizon = time.time() - _STAGING_TTL_SECONDS
    for entry in os.listdir(table_dir):
        if not entry.startswith("_staging_"):
            continue
        path = os.path.join(table_dir, entry)
        try:
            stale = os.path.getmtime(path) < horizon
        except OSError:
            continue  # vanished concurrently: its writer is cleaning up
        if stale:
            shutil.rmtree(path, ignore_errors=True)


def _stage_single_file(
    spark: SparkSession, df: DataFrame, table_dir: str, count_rows: bool = True
) -> tuple[str, str, int]:
    """Write ``df`` as one staged parquet file; returns (staging_dir,
    part_path, n_rows) — n_rows is -1 when ``count_rows`` is False (the
    caller already knows the count and skips the extra read job). The
    single-file coalesce is delta-bounded by construction (delete keys /
    upsert batches, never the base)."""
    staging = os.path.join(table_dir, f"_staging_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count() if count_rows else -1
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    return staging, os.path.join(staging, part), n


def mor_delete(
    spark: SparkSession, table_dir: str, key_col: str, predicate
) -> int:
    """Commit an equality delete: write the DISTINCT keys of the rows the
    predicate selects (evaluated on the current merged view, so a key
    already deleted is not re-recorded) as one new delete file in the
    live generation. The base files are NOT touched — that is the whole
    point; the commit itself is one O_EXCL-arbitrated atomic rename, and
    a commit displaced by a racing compaction is redone against the new
    generation (never silently lost). Returns the number of keys
    committed. NULL predicate follows SQL DELETE tri-state semantics:
    only TRUE deletes."""
    for _ in range(_MAX_COMMIT_RETRIES):
        gen = _live_gen(table_dir)
        matched = (
            mor_read(spark, table_dir, key_col, gen=gen)
            .filter(F.coalesce(predicate, F.lit(False)))
            .select(key_col)
            .distinct()
        )
        staging, part, n = _stage_single_file(spark, matched, table_dir)
        committed = _commit_fragment(table_dir, gen, "deletes", part)
        shutil.rmtree(staging, ignore_errors=True)
        if committed:
            return n
        # generation moved mid-commit: re-evaluate against the new live
        # merged view (the compacted base already folded older fragments)
    raise RuntimeError(
        f"mor_delete displaced by {_MAX_COMMIT_RETRIES} consecutive "
        "compactions — compaction is not supposed to run in a tight loop"
    )


def mor_upsert(
    spark: SparkSession, table_dir: str, key_col: str, rows: DataFrame
) -> int:
    """Row-level upsert (MERGE write path, Iceberg v2 delete+insert shape)
    as ONE atomic fragment commit: the insert file's rows shadow every
    lower-seq row with the same key (latest-wins by sequence number), so
    no separate delete file is needed and a crash can never publish half
    the MERGE — matched keys update, unmatched keys insert, in the same
    commit. ``rows`` must carry the base schema and unique keys (asserted:
    two rows for one key in one batch would make latest-wins ambiguous).
    Returns the number of rows committed."""
    # validate the INPUT once, before any staging I/O — the invariant is
    # about the caller's frame, and re-checking per displacement retry
    # would repeat two read jobs for an unchanged answer
    n = rows.count()
    n_keys = rows.select(key_col).distinct().count()
    if n_keys != n:
        raise ValueError(
            f"upsert batch has {n} rows but {n_keys} distinct "
            f"{key_col!r} keys — latest-wins needs unique keys per batch"
        )
    for _ in range(_MAX_COMMIT_RETRIES):
        gen = _live_gen(table_dir)
        staging, part, _ = _stage_single_file(
            spark, rows, table_dir, count_rows=False
        )
        committed = _commit_fragment(table_dir, gen, "inserts", part)
        shutil.rmtree(staging, ignore_errors=True)
        if committed:
            return n
    raise RuntimeError(
        f"mor_upsert displaced by {_MAX_COMMIT_RETRIES} consecutive "
        "compactions — compaction is not supposed to run in a tight loop"
    )


def mor_read(
    spark: SparkSession, table_dir: str, key_col: str, gen: int | None = None
) -> DataFrame:
    """The merged view of the (live, or explicitly pinned) generation:

    1. base rows (seq 0) not shadowed by any insert fragment's key and
    2. the HIGHEST-seq insert row per key (latest-wins upsert),
    3. minus every row suppressed by a delete fragment with a HIGHER seq
       (so a delete kills earlier versions, and a later upsert re-inserts).

    Scale shape: the big side (base) only ever anti-joins against the
    bounded fragment key sets — what has been deleted/upserted since the
    last compaction — so Spark's threshold/AQE broadcasts them without
    any explicit hint (plan-lint rule: never hint a broadcast on an
    unbounded side); the latest-wins window runs over insert fragments
    only, never the base."""
    if gen is None:
        gen = _live_gen(table_dir)
    base = spark.read.parquet(os.path.join(table_dir, _gen_name(gen), "base"))
    ins = _fragments(table_dir, gen, "inserts")
    dels = _fragments(table_dir, gen, "deletes")
    if not ins and not dels:
        return base
    rows = base.withColumn("_seq", F.lit(0))
    if ins:
        ins_df = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p).withColumn("_seq", F.lit(s))
                for s, p in ins
            ],
        )
        latest = (
            ins_df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(key_col).orderBy(F.col("_seq").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        shadowed = ins_df.select(key_col).distinct()
        rows = rows.join(shadowed, key_col, "left_anti").unionByName(latest)
    if dels:
        keys = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p)
                .select(F.col(key_col).alias("_dkey"))
                .withColumn("_dseq", F.lit(s))
                for s, p in dels
            ],
        )
        rows = rows.join(
            keys,
            (F.col(key_col) == F.col("_dkey")) & (F.col("_dseq") > F.col("_seq")),
            "left_anti",
        )
    return rows.drop("_seq")


def mor_compact(spark: SparkSession, table_dir: str, key_col: str) -> None:
    """Fold the live generation's fragments into the next generation:
    materialize the merged view into ``g{gen+1}/base``, atomically swap
    the pointer, and prune generations older than the displaced one (plus
    any crash-orphaned staging dirs). A reader holding the old pointer
    mid-scan still has its full generation (base + fragments) for one
    compaction cycle; readers resolving the pointer see either the old or
    the new generation — both the same rows, never a half state.

    Fragments committed into the displaced generation DURING the fold
    (their writer's pointer re-verify read the old pointer, so the commit
    reported success) are CARRIED FORWARD into the new generation after
    the swap, in global sequence order — without this sweep a delete
    racing the fold's write job would be silently lost. The snapshot of
    what the fold covers is taken BEFORE the merged plan lists fragment
    files, so a fragment in the plan but not the snapshot is merely
    re-applied — idempotent on a base that already folded it (delete keys
    already absent; insert rows shadow identical rows)."""
    gen = _live_gen(table_dir)
    folded = {
        sub: {s for s, _ in _fragments(table_dir, gen, sub)}
        for sub in ("deletes", "inserts")
    }
    merged = mor_read(spark, table_dir, key_col, gen=gen)
    # output sizing: the fold's anti-join/union would otherwise write one
    # near-empty file per shuffle partition; the merged rows are bounded
    # by the generation's on-disk bytes (base + insert fragments), so a
    # ceil(bytes / 128 MB) coalesce keeps ~128 MB files at any scale
    # without a count job (the module is local-FS-addressed throughout)
    gen_dir = os.path.join(table_dir, _gen_name(gen))
    # the walk races with concurrent fragment commits (supported here:
    # the carry-forward sweep exists precisely for them) — a .lock claim
    # or a displaced fragment can vanish between listing and stat, so a
    # vanished file counts 0; .lock claims and delete fragments are
    # skipped outright (deletes only shrink the fold's output — the bound
    # stays conservative for base + insert bytes)
    gen_bytes = sum(
        _size_or_zero(os.path.join(dirpath, f))
        for dirpath, _dirs, files in os.walk(gen_dir)
        for f in files
        if not f.endswith(".lock") and os.path.basename(dirpath) != "deletes"
    )
    n_files = max(1, -(-gen_bytes // (128 << 20)))
    merged.coalesce(n_files).write.mode("overwrite").parquet(
        os.path.join(table_dir, _gen_name(gen + 1), "base")
    )
    _swap_pointer(table_dir, gen + 1)
    late = sorted(
        (seq, sub, path)
        for sub in ("deletes", "inserts")
        for seq, path in _fragments(table_dir, gen, sub)
        if seq not in folded[sub]
    )
    for _, sub, path in late:  # ascending seq: relative order preserved
        _carry_fragment_forward(table_dir, gen + 1, sub, path)
    for entry in os.listdir(table_dir):
        if (
            entry.startswith("g")
            and entry[1:].isdigit()
            and int(entry[1:]) < gen
        ):
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
    _sweep_staging_orphans(table_dir)
