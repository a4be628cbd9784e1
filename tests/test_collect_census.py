"""CI gate for the collect-site census (r7 verdict item 4c).

Two-sided: an un-allowlisted driver materialization fails (new collects
need a written bound argument in quality/collect_census.py), and a stale
allowlist entry fails (the census never rots). No Spark session needed —
pure AST."""

from f1_lakehouse_spark.quality.collect_census import (
    ALLOWLIST,
    census,
    offenders,
    stale_entries,
)


def test_no_unjustified_collect_sites():
    assert offenders() == []


def test_no_stale_allowlist_entries():
    assert stale_entries() == []


def test_census_sees_the_known_sites():
    """Sanity: the census finds the canonical guarded sites (if the AST
    walk silently broke, both gates above would pass vacuously)."""
    got = {(rel, fn) for rel, fn, _, _ in census()}
    for key in [
        ("pinning.py", "pin_small_result"),
        ("operators/extensions.py", "grouped_prefix_rank"),
        ("operators/extensions.py", "global_prefix_sum"),
    ]:
        assert key in got, key
    assert all(just.strip() for just in ALLOWLIST.values())
