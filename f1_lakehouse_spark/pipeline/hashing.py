"""Deterministic hashing primitives shared by the dedup/similarity operators.

Everything here exists in TWO synchronized renderings: a Spark Column
expression and a DuckDB SQL snippet, implementing the *same* integer
arithmetic so differential results are bit-identical. We deliberately avoid
engine-native hash functions (Spark murmur3 `hash()`, DuckDB `hash()`) —
they differ — and use a 31-base polynomial rolling hash mod 1e9+7, the
classic Rabin-Karp / Java-String construction.

All arithmetic stays in int64: acc < 1e9+7, acc*31 + cp < 3.3e10 << 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007

# --- polynomial string hash ---------------------------------------------------


def spark_poly_hash(c: Column | str) -> Column:
    """Left fold over codepoints: acc = (acc*31 + ord(ch)) % MOD."""
    c = F.col(c) if isinstance(c, str) else c
    chars = F.split(c, "")
    fold = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch).cast("long")) % F.lit(MOD),
    )
    # empty-string behavior differs between engines' split; pin it to 0
    return F.when(c == "", F.lit(0).cast("long")).otherwise(fold)


def sql_poly_hash(expr: str) -> str:
    """DuckDB twin of :func:`spark_poly_hash`."""
    fold = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(regexp_split_to_array({expr}, ''), "
        f"ch -> ord(ch)::BIGINT)), (acc, ch) -> (acc*31 + ch) % {MOD})"
    )
    return f"(CASE WHEN {expr} = '' THEN 0 ELSE {fold} END)"


# --- md5-derived 48-bit integer hash --------------------------------------------
# For dedup keys the hash only needs to be deterministic and identical across
# engines; md5 is native (fast, no per-char fold) in both Spark and DuckDB.
# 12 hex chars = 48 bits, comfortably inside int64.


def spark_md5_hash48(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long")


def sql_md5_hash48(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 12)) AS BIGINT)"


# --- salted variant -------------------------------------------------------------
# One hash-derived decision per (key, tag): the constant tag salt makes each
# decision (split bucket, sample rank, shard, canary pick, ...) independent
# of every other hash decision on the same key. Spark/SQL twins stay in
# lockstep by construction — both are md5 over "<key><tag>" (call sites
# pass tags like ":split" with the separator included).


def spark_salted_hash(col: Column | str, tag: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return spark_md5_hash48(F.concat(c.cast("string"), F.lit(tag)))


def sql_salted_hash(expr: str, tag: str) -> str:
    return sql_md5_hash48(f"CAST({expr} AS VARCHAR) || '{tag}'")


# --- affine re-hash family for MinHash -----------------------------------------
# h_i(x) = (a_i*x + b_i) % MOD with small odd multipliers; x < MOD so the
# product stays < 2^63.

MINHASH_PARAMS: list[tuple[int, int, int]] = [
    (i, 2 * i + 3, 7919 * (i + 1) % MOD) for i in range(16)
]  # (i, a_i, b_i); 16 hashes → 4 bands × 4 rows

BAND_SIZE = 4
# order-independent band combine: sum(minhash_i * 31^(i % BAND_SIZE)); the
# weighted sum of 4 values < MOD*29791 < 2^63 needs no modulo and commutes,
# so neither engine's aggregation order matters.
BAND_POWERS = [31**k for k in range(BAND_SIZE)]


# --- indexed hash family (sketch rows: CMS, Bloom) -----------------------------------
# h_i(key) for sketches that need several independent hash functions per
# key: md5 over "i<sep>key". One synchronized Spark/SQL pair — the modulus
# (bucket width / bit count) is applied at the call site.


def spark_indexed_hash48(i_col: Column, key_col: Column, sep: str) -> Column:
    return spark_md5_hash48(
        F.concat(i_col.cast("string"), F.lit(sep), key_col.cast("string"))
    )


def sql_indexed_hash48(i_expr: str, key_expr: str, sep: str) -> str:
    return sql_md5_hash48(
        f"CAST({i_expr} AS VARCHAR) || '{sep}' || CAST({key_expr} AS VARCHAR)"
    )
