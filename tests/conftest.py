from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from f1_lakehouse_spark.session import get_spark
from f1_lakehouse_spark.tables import TABLE_NAMES, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    derby = tmp_path_factory.mktemp("derby")
    s = get_spark(
        app_name="f1_lakehouse_spark_tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={derby}",
        },
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for engine-agnostic comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # duckdb returns Decimal for DECIMAL, datetimes as naive; Spark rows give
    # datetime too — compare via str for those composites.
    return v


def rows_to_multiset(cols, rows):
    """(sorted col names, multiset of tuples ordered by sorted col name)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


def assert_matches_oracle(spark, duck, name, sf_dir=SF_DIR, float_exact=True):
    """Local replica of the driver's correctness gate: row-count + column
    names + order-insensitive value comparison (exact by default)."""
    from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} has no oracle"

    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )

    sc, sm = rows_to_multiset(s_cols, s_rows)
    dc, dm = rows_to_multiset(d_cols, d_rows)
    mismatches = []
    for i, (a, b) in enumerate(zip(sm, dm)):
        if not _row_eq(a, b, float_exact):
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"


def _row_eq(a, b, float_exact):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not y:
                return False
            continue
        if isinstance(x, float) and isinstance(y, (float, int)):
            if float_exact:
                if x != float(y):
                    return False
            elif not math.isclose(x, float(y), rel_tol=1e-9, abs_tol=1e-12):
                return False
        elif isinstance(y, float) and isinstance(x, (float, int)):
            if float_exact:
                if float(x) != y:
                    return False
            elif not math.isclose(float(x), y, rel_tol=1e-9, abs_tol=1e-12):
                return False
        else:
            if str(x) != str(y):
                return False
    return True
