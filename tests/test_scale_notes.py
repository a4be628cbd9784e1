"""SCALE.md completeness gate (r4 verdict item 5): every registered query
must carry an explicit pointer to its 100 TB design argument."""

from __future__ import annotations

import re
from pathlib import Path

from f1_lakehouse_spark.registry import REGISTRY, _ensure_loaded
from f1_lakehouse_spark.scale_notes import SCALE_SECTION

_ensure_loaded()
SCALE_MD = (Path(__file__).resolve().parent.parent / "docs" / "SCALE.md").read_text()
SECTIONS = {
    part.split("\n", 1)[0].strip(): part.split("\n", 1)[1]
    for part in re.split(r"(?m)^## ", SCALE_MD)[1:]
}


def test_every_registered_query_has_a_scale_note():
    missing = sorted(set(REGISTRY) - set(SCALE_SECTION))
    assert missing == [], (
        "new operators need a 100 TB design argument: add the section to "
        f"docs/SCALE.md and the pointer to scale_notes.SCALE_SECTION: {missing}"
    )


def test_no_stale_scale_note_entries():
    stale = sorted(set(SCALE_SECTION) - set(REGISTRY))
    assert stale == [], f"scale-note entries for unregistered queries: {stale}"


def test_scale_note_sections_exist_and_are_substantive():
    for name, section in SCALE_SECTION.items():
        assert section in SECTIONS, (name, section)
        assert len(SECTIONS[section]) > 200, f"section too thin: {section}"
