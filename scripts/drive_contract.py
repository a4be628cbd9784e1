"""Emulate the driver: fresh process, import __spark_entry__, smoke entry(),
then run every queries() entry at sf0.01 against oracle_sql() via DuckDB.

DRIVE_VANILLA=1 drops the local[8]/shuffle-partitions overrides and builds
the session exactly like the real driver (vanilla builder: local[32] on
this host, 200 shuffle partitions) — closes the emulator-fidelity gap that
could mask partition-count- or batch-split-dependent bugs. In that mode
every side-effectful query (registry tag "lifecycle" / "sink") runs TWICE
and the stringified results must be identical — catches replay and
batch-split nondeterminism a single-run compare can't."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

import __spark_entry__ as m
from f1_lakehouse_spark.quality.dtype_lint import family_mismatches

VANILLA = os.environ.get("DRIVE_VANILLA") == "1"
if VANILLA:
    spark = SparkSession.builder.getOrCreate()
else:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# t1 smoke: entry() at sf0.001
df = m.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows, schema={[f.name for f in df.schema]}")
assert len(rows) > 0

# t2: differential at sf0.01 like the driver
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = m.queries(), m.oracle_sql()
only = os.environ.get("DRIVE_ONLY")
if only:  # comma-separated subset for targeted re-verification
    keep = {n.strip() for n in only.split(",")}
    qs = {n: f for n, f in qs.items() if n in keep}
print(f"{len(qs)} queries, {len(oracles)} oracles")

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
_ensure_loaded()
SIDE_EFFECTFUL = {
    n for n, q in REGISTRY.items() if {"lifecycle", "sink"} & set(q.tags)
}

fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sorted(sdf.columns)
    if VANILLA and name in SIDE_EFFECTFUL:
        # twice-through: a fresh tempdir + checkpoint each run, so any
        # divergence is batch-split/replay nondeterminism, not state reuse
        sdf2 = fn(spark, SF)
        srows2 = [tuple(r) for r in sdf2.collect()]
        if sorted(map(str, srows)) != sorted(map(str, srows2)):
            fails.append((name, "twice-through", len(srows), len(srows2)))
            print(f"  {name}: TWICE-THROUGH-FAIL")
            continue
    status = "rows-only"
    if name in oracles:
        res = con.execute(oracles[name])
        dcols = sorted(d[0] for d in res.description)
        drows = res.fetchall()
        rel = con.sql(oracles[name])
        fams = family_mismatches(dict(sdf.dtypes), dict(zip(rel.columns, map(str, rel.types))))
        if scols != dcols:
            fails.append((name, "schema", scols, dcols)); status="SCHEMA-FAIL"
        elif fams:
            # the driver's value hash is dtype-sensitive; a str()-equal result
            # with a diverging type family would pass here but fail there
            fails.append((name, "dtype-family", fams)); status="DTYPE-FAIL"
        elif len(srows) != len(drows):
            fails.append((name, "rowcount", len(srows), len(drows))); status="COUNT-FAIL"
        else:
            idx = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
            res2 = con.execute(oracles[name])
            dcolnames = [d[0] for d in res2.description]
            didx = sorted(range(len(dcolnames)), key=lambda i: dcolnames[i])
            sset = sorted([tuple(str(r[i]) for i in idx) for r in srows])
            dset = sorted([tuple(str(r[i]) for i in didx) for r in res2.fetchall()])
            status = "MATCH" if sset == dset else "VALUE-FAIL"
            if status == "VALUE-FAIL":
                diff = [(a,b) for a,b in zip(sset,dset) if a!=b][:2]
                fails.append((name, "values", diff))
    print(f"  {name}: {len(srows)} rows [{status}] {time.time()-t0:.1f}s")
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
