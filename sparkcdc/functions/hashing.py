"""Deterministic, cross-engine-stable hashing.

Two hash families serve different purposes:

- ``F.xxhash64`` — fastest JVM-side 64-bit hash; used for *internal*
  partition/bucket routing (lake.py bucket assignment, PartitionRouting.java:241
  analog) where only Spark ever recomputes it.
- ``stable_hash64`` below — sha256-derived 60-bit hash whose value is
  reproducible in any engine (DuckDB: ``CAST(concat('0x',
  substr(sha256(x),1,15)) AS BIGINT)``); used wherever a hash value is part
  of a *result* that an external oracle must verify (dedup signatures,
  simhash, fingerprints). Slower than xxhash64 but still fully vectorized
  JVM-side (sha2 + conv are builtin codegen expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of leading hex chars of sha256 used → 15*4 = 60 bits, fits a long
HEX_DIGITS = 15


def sha256_hex(*cols: Column | str, sep: str = "|") -> Column:
    """Lowercase hex sha256 of the '|'-joined column values.

    The north-star verification invariant (BASELINE.json input_hint:
    per-row ``sha256(content)`` equality) — builtin ``sha2``, no UDF
    (cf. the salted-hash masking at core/relational/mapping/MaskStrings.java).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(sep, *cs), 256)


def stable_hash64(*cols: Column | str, seed: int | str | None = None) -> Column:
    """60-bit non-negative deterministic hash, identical in Spark and DuckDB.

    Spark:  conv(substr(sha2(concat_ws('|', seed?, cols), 256), 1, 15), 16, 10)
    DuckDB: CAST(concat('0x', substr(sha256(concat_ws('|', ...)), 1, 15)) AS BIGINT)
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if seed is not None:
        cs = [F.lit(str(seed))] + cs
    return F.conv(
        F.substring(F.sha2(F.concat_ws("|", *cs), 256), 1, HEX_DIGITS), 16, 10
    ).cast("long")


#: Mersenne prime 2^31-1 — the modulus of the universal hash family used by
#: MinHash (one sha256 base hash per shingle, k cheap linear mixes:
#: h_i = (A[i]*h + B[i]) mod P — the classic (a*x+b) mod p family)
MINHASH_P = 2_147_483_647

#: fixed odd multipliers / offsets (Knuth multiplicative constant orbit);
#: literals so external oracles can reproduce them
MINHASH_A = [((2_654_435_761 * (i + 1)) % MINHASH_P) | 1 for i in range(64)]
MINHASH_B = [(40_503 * (i + 7) ** 2) % MINHASH_P for i in range(64)]


def stable_hash_sql(expr_sql: str, seed: int | str | None = None) -> str:
    """The DuckDB-side rendering of ``stable_hash64`` for oracle SQL strings.

    ``expr_sql`` is a SQL expression (already |-joined if multi-column).
    """
    inner = f"concat_ws('|', '{seed}', {expr_sql})" if seed is not None else expr_sql
    return f"CAST(concat('0x', substr(sha256({inner}), 1, {HEX_DIGITS})) AS BIGINT)"
