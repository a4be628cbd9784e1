"""Training-shard writer: the handoff artifact at the end of a curation
pipeline — deterministic hash-sharded parquet plus a manifest recording,
per shard, the row count and an order-independent content checksum.

Consumers (training jobs) need three properties the plain parquet sink
does not give them:

- **Deterministic membership**: a row's shard depends only on its key
  (md5-derived, `pipeline/hashing.py` discipline) — re-running the
  pipeline on the same input reproduces byte-identical shard membership
  regardless of partitioning, task retries, or cluster size.
- **Verifiable handoff**: the manifest's per-shard checksum is an
  order-independent SUM of per-row hashes (Spark sums them as decimal —
  exact under any execution order), so a consumer can re-derive it and
  detect truncated/corrupt/partial shards without trusting the producer.
- **Idempotent rebuild**: same input → same manifest (tested); the write
  itself is dynamic-partition-overwrite per shard directory.

Scale: the shard column is a map-side hash; the write shuffles once on
shard (bounded fan-out, uniformly distributed keys); the manifest
aggregate is one groupBy(shard) with map-side combine — n_shards rows to
the driver, a model-sized collect.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_lakehouse_spark.pipeline.hashing import spark_md5_hash48, spark_salted_hash

MANIFEST_NAME = "_MANIFEST.json"

_NULL_SENTINEL = "\x00<NULL>"


def _row_hash(cols: list[str]):
    """Order-independent-summable per-row hash over the named columns (name
    order). NULLs are encoded with an explicit sentinel: plain concat_ws
    SKIPS null elements, so (x, NULL) and (NULL, x) — or a corrupted shard
    that nulls one column and shifts the value into another — would hash
    identically and slip past verification."""
    return spark_md5_hash48(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols],
        )
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int = 8,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-sharded parquet directories plus a
    manifest; returns the manifest dict. Columns are hashed in name order
    for the row checksum, so schema drift changes the checksum (by
    design — a consumer pinned to a manifest notices silent column
    changes). The manifest's counts/checksums are computed by READING THE
    WRITTEN FILES BACK — recomputing from the source lineage would describe
    what a second evaluation of ``df`` produces, not what landed on disk
    (nondeterministic/time-varying sources would silently void the
    corruption guarantee), and would cost a second scan of the source."""
    shard = (spark_salted_hash(key_col, ":shard") % n_shards).alias("shard")
    cols = sorted(df.columns)
    sharded = df.withColumn("shard", shard)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    written = sharded.sparkSession.read.parquet(out_dir)
    stats = (
        written.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_row_hash(cols).cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "columns": cols,
        "total_rows": int(sum(r["n_rows"] for r in stats)),
        "shards": {
            str(r["shard"]): {
                "n_rows": int(r["n_rows"]),
                "checksum": str(r["checksum"]),
            }
            for r in stats
        },
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_training_shards(spark, out_dir: str) -> dict:
    """Consumer-side verification: re-derive each shard's count + checksum
    from the files and compare against the manifest. Returns
    ``{"ok": bool, "mismatched_shards": [...]}``."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(out_dir)
    cols = manifest["columns"]
    stats = {
        str(r["shard"]): (int(r["n_rows"]), str(r["checksum"]))
        for r in df.groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_row_hash(cols).cast("decimal(38,0)")).alias("checksum"),
        )
        .collect()
    }
    bad = []
    for sid, want in manifest["shards"].items():
        got = stats.get(sid)
        if got is None or got[0] != want["n_rows"] or got[1] != want["checksum"]:
            bad.append(sid)
    bad.extend(sid for sid in stats if sid not in manifest["shards"])
    return {"ok": not bad, "mismatched_shards": sorted(bad)}
