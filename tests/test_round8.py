"""Round-8 operator properties beyond the differential gate.

- curriculum interleave: the schedule must be a BIJECTION onto 1..n (a
  round-robin that skips or double-books a position would still pass a
  per-row NTILE check), and within a decile positions must follow the
  difficulty order.
- BM25: third-implementation check — a pure-Python reference computed
  with math.log on pandas rows must reproduce the Spark/DuckDB-agreed
  top-k exactly (the differential gate proves Spark==DuckDB; this proves
  both equal the textbook formula, not a shared mis-derivation).
"""

from __future__ import annotations

import math

from f1_lakehouse_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_curriculum_schedule_is_bijective_and_ordered(spark):
    from f1_lakehouse_spark.pipeline.curation import (
        CURRICULUM_K,
        curation_curriculum_interleave,
    )

    rows = curation_curriculum_interleave(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    # bijection onto 1..n
    assert sorted(r["schedule_pos"] for r in rows) == list(range(1, n + 1))
    # decile sizes follow the NTILE contract: first n%k deciles one larger
    sizes = {}
    for r in rows:
        sizes[r["decile"]] = sizes.get(r["decile"], 0) + 1
    q, rem = divmod(n, CURRICULUM_K)
    want = {d: q + 1 if d <= rem else q for d in range(1, CURRICULUM_K + 1)}
    assert sizes == {d: c for d, c in want.items() if c > 0}
    # within each decile, pos_in_decile follows (n_chars, doc_id) ascending
    for d in sizes:
        members = sorted(
            (r for r in rows if r["decile"] == d),
            key=lambda r: (r["n_chars"], r["doc_id"]),
        )
        assert [r["pos_in_decile"] for r in members] == list(
            range(1, len(members) + 1)
        )


def test_bm25_matches_pure_python_reference(spark):
    from f1_lakehouse_spark.pipeline.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERY_TERMS,
        BM25_TOPK,
        text_bm25_retrieval,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / float(n)
    df = {
        t: sum(1 for ws in toks.values() if t in ws) for t in BM25_QUERY_TERMS
    }
    scored = []
    for doc_id, ws in toks.items():
        s = 0.0
        for t in BM25_QUERY_TERMS:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(ws) / avgdl)
            )
        if s > 0.0:
            scored.append((doc_id, s))
    scored.sort(key=lambda p: (-p[1], p[0]))
    want = [
        (doc_id, round(s, 9), i + 1)
        for i, (doc_id, s) in enumerate(scored[:BM25_TOPK])
    ]

    got = [
        (r["doc_id"], r["bm25"], r["rk"])
        for r in text_bm25_retrieval(spark, SF_DIR).collect()
    ]
    # float path differences (python sum order vs Spark's fixed pivot order)
    # stay far inside the 9-decimal round; compare exactly post-round
    assert [(d, rk) for d, _, rk in got] == [(d, rk) for d, _, rk in want]
    for (_, g, _), (_, w, _) in zip(got, want):
        assert abs(g - w) < 1e-8
