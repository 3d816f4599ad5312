"""Column-expression text helpers (all JVM-side — no Python UDFs).

The cross-engine trick used by the dedup family: a shingle string is
mapped to an integer with ``conv(substr(md5(s),1,15),16,10)`` — both
Spark and DuckDB compute the identical value (60-bit, fits int64) —
then reduced mod p = 2^31-1 so affine minhash permutations
``(a*x + b) % p`` stay inside int64 without overflow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Fixed affine permutation constants (a, b) for minhash; k = 16.
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (999983, 17), (999979, 9377), (999961, 31393), (999959, 54979),
    (999953, 73943), (999931, 95989), (999917, 117991), (999907, 139999),
    (999883, 161983), (999863, 184003), (999841, 205963), (999809, 227947),
    (999773, 249989), (999749, 271993), (999727, 293999), (999721, 315979),
)


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokens (docs are single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles as strings; 1-indexed to mirror SQL list indexing.

    Docs shorter than n words yield an EMPTY list (matching DuckDB's
    generate_series(1, len-n+1) which is empty when the end < 1).
    slice() instead of element_at keeps ANSI mode happy: the guard
    branch means no out-of-range index is ever evaluated."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def shingle_int(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def shingle_int_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingle_int_spark_sql(expr: str) -> str:
    """Spark-SQL TEXT form of shingle_int — for use inside HOF lambda
    strings, where a Column can't be injected. The three spellings
    (Column, DuckDB SQL, Spark SQL) must stay in lockstep: they are
    one cross-engine hash contract."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def minhash_expr(x_mod_p: Column, a: int, b: int) -> Column:
    """One affine minhash permutation over a mod-p-reduced shingle int."""
    return (x_mod_p * a + b) % MERSENNE_P
