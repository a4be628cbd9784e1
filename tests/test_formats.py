"""Multi-format round-trips: every interchange format preserves values."""

from __future__ import annotations

import tempfile

from f1_lakehouse_spark.sources import formats
from f1_lakehouse_spark.tables import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_csv_roundtrip(spark):
    o = load_table(spark, SF_DIR, "orders")
    with tempfile.TemporaryDirectory() as tmp:
        formats.write_csv(o, f"{tmp}/orders_csv")
        back = formats.read_csv(spark, f"{tmp}/orders_csv", o.schema)
        assert back.schema == o.schema
        assert _rows(back) == _rows(o)


def test_json_roundtrip(spark):
    n = load_table(spark, SF_DIR, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        formats.write_json(n, f"{tmp}/nation_json")
        back = formats.read_json(spark, f"{tmp}/nation_json", n.schema)
        assert _rows(back) == _rows(n)


def test_orc_roundtrip(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        formats.write_orc(li, f"{tmp}/lineitem_orc")
        back = formats.read_orc(spark, f"{tmp}/lineitem_orc")
        assert back.count() == li.count()
        assert _rows(back.select("l_orderkey", "l_linenumber")) == _rows(
            li.select("l_orderkey", "l_linenumber")
        )


def test_delta_reports_unavailable_not_crash(spark):
    # this environment ships no Delta jar, so the probe must say False —
    # the py4j attribute-access version always said True (JavaPackage
    # attributes never raise), which is exactly the bug this pins
    assert formats.delta_available(spark) is False


def test_json_tolerant_quarantines_malformed_lines(spark):
    """A dirty JSON feed must not fail the read: good lines parse, bad
    lines land whole in the quarantine column, nothing is silently
    dropped (row conservation)."""
    import os

    n = load_table(spark, SF_DIR, "nation")
    with tempfile.TemporaryDirectory() as tmp:
        formats.write_json(n, f"{tmp}/nation_json")
        with open(f"{tmp}/nation_json/zz_bad.json", "w") as f:
            f.write('{"n_nationkey": 99, "n_name": "BROKEN"\n')  # unclosed
            f.write("not json at all\n")
        df = formats.read_json_tolerant(spark, f"{tmp}/nation_json", n.schema)
        clean, bad, cached = formats.split_quarantine(df)
        n_rows = n.count()
        assert clean.count() == n_rows
        assert bad.count() == 2
        assert df.count() == n_rows + 2  # conservation: nothing dropped
        assert _rows(clean.select("n_nationkey", "n_name")) == _rows(
            n.select("n_nationkey", "n_name")
        )
        cached.unpersist()
        # regression: the tolerant read must NOT mutate the caller's schema
        # (StructType.add appends in place) — a second read with the same
        # schema object used to produce a duplicate corrupt column
        assert formats.CORRUPT_COL not in n.schema.fieldNames()
        df2 = formats.read_json_tolerant(spark, f"{tmp}/nation_json", n.schema)
        assert df2.schema.fieldNames().count(formats.CORRUPT_COL) == 1


def test_xpath_matches_from_xml(spark):
    """xpath_* functions stay covered here on a small frame — the
    registered query uses from_xml (StaxXmlParser) because xpath builds a
    DOM per row (~50x slower at sf0.1; see xml_roundtrip_events doc)."""
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.to_xml(
            F.struct(F.col("id"), (F.col("id") % 7).alias("slot"))
        ).alias("x")
    )
    got = df.select(
        F.xpath_long("x", F.lit("/ROW/slot")).alias("via_xpath"),
        F.col("x"),
        F.from_xml("x", "id bigint, slot bigint").alias("s"),
    ).select("via_xpath", F.col("s.slot").alias("via_stax"))
    assert got.filter("via_xpath <> via_stax").count() == 0
    assert got.count() == 200
