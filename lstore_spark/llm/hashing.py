"""Portable (Spark↔DuckDB) deterministic hashing for text operators.

Spark's murmur3 ``hash()`` and DuckDB's ``hash()`` are different
functions, so any oracle-checked operator that *hashes* must build the
hash from primitives both engines share.  md5 hex output is identical in
both; we turn its leading hex digits into a BIGINT with pure string/int
arithmetic (strpos + positional powers of 16), generated as the *same SQL
text* for both engines — parity by construction.

Cost note: this is for oracle-checkable queries.  Hot-path hashing
(MinHash at 100 TB) uses Spark's native murmur3/xxhash64, which is
JVM-codegen'd; those operators are rows-only checked.
"""

from __future__ import annotations

HEX = "0123456789abcdef"


def sql_hex_digit(expr: str, i: int) -> str:
    """Value 0..15 of the i-th (1-based) hex digit of ``expr``.
    ``instr`` exists with identical semantics in Spark SQL and DuckDB."""
    return f"(instr('{HEX}', substr({expr}, {i}, 1)) - 1)"


def sql_md5_long(expr: str, n_digits: int = 12) -> str:
    """BIGINT from the first ``n_digits`` hex digits of md5(expr);
    identical SQL evaluates identically in Spark SQL and DuckDB."""
    md5 = f"md5({expr})"
    # Powers of 16 as explicit BIGINT: Spark's ANSI mode would otherwise
    # overflow the INT×INT product for digits above position 8.
    terms = [
        f"{sql_hex_digit(md5, i)} * CAST({16 ** (n_digits - i)} AS BIGINT)"
        for i in range(1, n_digits + 1)
    ]
    return "(" + " + ".join(terms) + ")"
