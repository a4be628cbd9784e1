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
4. **Retention** — for each table in the txn, keep the new version plus
   the version the outgoing manifest named (readers holding the old
   manifest survive one publish cycle, exactly like the single-table
   layout); everything older is pruned.

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

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"


class SimulatedCrash(RuntimeError):
    """Raised by the ``fail_after_writes`` test hook to emulate a process
    crash between a transaction's version-dir writes and its manifest
    swap. Production code never raises this."""


def read_manifest(root: str) -> dict | None:
    """The committed transaction: ``{"txn": int, "tables": {name: version}}``,
    or None before the first publish. Read it ONCE per logical read and
    resolve all tables through the same dict — that is the snapshot."""
    path = os.path.join(root, MANIFEST)
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


def publish_tables(
    spark: SparkSession,
    root: str,
    tables: dict[str, DataFrame],
    txn_id: int,
    fail_after_writes: int | None = None,
) -> None:
    """Atomically publish every frame in ``tables`` as transaction
    ``txn_id`` (see module docstring for the protocol). Idempotent under
    crash-replay; ``txn_id`` must be monotonically increasing across
    publishes to the same root."""
    os.makedirs(root, exist_ok=True)
    version = f"v{txn_id:010d}"
    cur = read_manifest(root)
    if cur is not None:
        if cur["txn"] == txn_id:
            # crash-replay AFTER a completed commit: the transaction is
            # durable and live — the no-op IS the idempotent replay
            return
        if cur["txn"] > txn_id:
            raise ValueError(
                f"txn_id {txn_id} is older than the committed {cur['txn']}"
            )
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
    prev_tables = dict(cur["tables"]) if cur else {}
    new_manifest = {
        "txn": txn_id,
        "tables": {**prev_tables, **{n: version for n in tables}},
    }
    tmp = os.path.join(root, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(new_manifest, f)
    os.replace(tmp, os.path.join(root, MANIFEST))
    # retention: per table, the displaced version survives one cycle for
    # readers holding the outgoing manifest; everything older is pruned
    for name in tables:
        keep = {version, prev_tables.get(name)}
        tdir = os.path.join(root, name)
        for entry in os.listdir(tdir):
            if entry.startswith("v") and entry not in keep:
                shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
