"""Deterministic numeric aggregation helpers (oracle-parity discipline).

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation
over 32 shuffle partitions and DuckDB's single-node scan sum the same
doubles in different orders, so raw double aggregates differ in the last
ulps and fail an exact value-hash comparison.

Fix: aggregate in *exact decimal* arithmetic, then cast the final value
back to double.  The input doubles encode values with <=4 true decimal
digits (prices, discounts, event values), so casting each per-row term to
DECIMAL(30,8) is rounding-mode-proof (the double sits ~1e-12 from an
exact 4-digit decimal, never near a half-ulp boundary at 8 digits), the
decimal sum is exact and order-independent, and the final decimal->double
cast is a single deterministic rounding.  The DuckDB oracle does the
literal same thing — see ``DSUM``/``DAVG`` SQL templates.

Per-row double arithmetic (x*y, 1-x, ...) is bit-identical across engines
(IEEE 754) and needs no special handling; only *aggregated* floats and
libm-backed functions (ln/exp/pow — wrap in round()) do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,8)"

# r13 optimization round: a narrower long-backed per-row cast width for
# dsum/davg (decimal(18,8)) was prototyped and A/B-measured — an
# INTERLEAVED same-session comparison on the TPC-H-Q1 flagship showed
# no effect (pairwise ratios 0.90-1.49 straddling 1.0; the apparent
# 7.06 -> 4.08 s win in a block-sequential run was ambient drift).
# The decimal aggregate's cost at this scale is decimal-ness itself
# (vs ~0.8 s for raw double sums), not the 30-vs-18 precision, so the
# width stays at the single battle-tested (30,8).


def dsum(col: Column, alias: str) -> Column:
    """Exact, order-independent sum of a double expression, as double."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


# ---- long-scaled split accumulation (r14, VERDICT r13 #6) ----------------
#
# The decimal aggregate's per-row cost is decimal-ness itself (the r13
# width A/B showed 30-vs-18 precision is a no-op).  For inputs in the
# documented dsum domain (<=6 true decimal digits per row — prices,
# quantities, rates, and their 2-factor products), the DECIMAL(30,8)
# cast of a row is EXACTLY representable as the unscaled long
# v = round(x·1e8): the double sits ~1e-12·x from the true <=6-digit
# decimal, never near a half at 1e-8, so both paths recover the same
# integer.  Accumulating v as TWO long sums — hi = floor(v/1e6),
# lo = pmod(v, 1e6), Σv = 1e6·Σhi + Σlo — is then value-identical to
# the decimal sum (integer arithmetic is exact and order-free), and the
# final value is reconstructed through exact DECIMAL(38,8) divisions so
# the closing decimal→double cast is the same correctly-rounded one.
# Overflow headroom under ANSI (loud, never silent): Σlo < 1e6·rows,
# Σhi <= (max|x|·1e2)·rows — at 100 TB lineitem (~6e11 rows/group-side,
# |price|<=1e5) both sit under int64.  Measured on TPC-H Q1 at sf0.1
# (scripts/ab_groupby_hash_r14.json, interleaved, quiet window):
# decimal 1.172 s median / split 0.990 / unsplit-long 0.811 (the
# overflow-unsafe ceiling).  Used by the hot flagship aggregate only;
# everything else stays on the battle-tested dsum/davg.

_SPLIT_M = 1_000_000


def long8(col: Column) -> Column:
    """Unscaled-long image of ``col.cast(DEC)``: round(x·1e8) — exact
    for the <=6-true-decimal dsum input domain (see block comment)."""
    return F.round(col * F.lit(100_000_000.0), 0).cast("long")


def split_sums(col: Column, tag: str) -> list[Column]:
    """The two aggregate columns accumulating ``long8(col)`` with int64
    headroom: s<tag>h = Σ floor(v/1e6), s<tag>l = Σ pmod(v, 1e6).
    (floor + pmod keep the v = hi·1e6 + lo identity for negative v.)"""
    v = long8(col)
    return [
        F.sum(F.floor(v / F.lit(_SPLIT_M)).cast("long")).alias(f"s{tag}h"),
        F.sum(F.pmod(v, F.lit(_SPLIT_M))).alias(f"s{tag}l"),
    ]


def split_value(tag: str) -> Column:
    """Exact double from a split pair: Σhi/1e2 + Σlo/1e8, each division
    carried out in DECIMAL(38,8) (result scale 8, no value rounding for
    this domain), then one correctly-rounded cast to double — the same
    closing cast dsum makes."""
    hi = (F.col(f"s{tag}h").cast("decimal(38,8)") / F.lit(100))
    lo = (F.col(f"s{tag}l").cast("decimal(38,8)") / F.lit(100_000_000))
    return (hi + lo).cast("double")


def davg(col: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


# DuckDB's direct DECIMAL→DOUBLE cast goes int128→double (rounds the
# *scaled* integer at 2^53, then divides by 10^scale) and drifts one ulp
# from the correctly-rounded value once |sum|·10^8 > 2^53 — observed at
# sf0.1 on TPC-H-sized revenue sums.  Spark's BigDecimal.doubleValue is
# correctly rounded, so the oracle routes through VARCHAR (strtod is
# correctly rounded) to match.
def sql_dec2dbl(sum_expr: str) -> str:
    return f"CAST(CAST({sum_expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return (f"{sql_dec2dbl(f'SUM(CAST({expr} AS DECIMAL(30,8)))')}"
            f" AS {alias}")


def sql_davg(expr: str, alias: str) -> str:
    return (f"{sql_dec2dbl(f'SUM(CAST({expr} AS DECIMAL(30,8)))')}"
            f" / COUNT({expr}) AS {alias}")


# Entropy/log discipline: a float term whose cross-engine disagreement
# is bounded far below 1e-9 (e.g. n·log2(n) of integer counts — libm vs
# JVM log differ ≤ ~1 ulp) rounds at the 1e-9 grain and then sums
# EXACTLY as decimal, making the aggregate order-independent and
# hash-portable.  One grain, one decimal width, centralized here.
DEC9 = "DECIMAL(30,12)"


def round9_dec(col: Column) -> Column:
    return F.round(col, 9).cast(DEC9.lower())


def dsum9(col: Column) -> Column:
    """Order-independent sum of 1e-9-rounded terms, as double."""
    return F.sum(round9_dec(col)).cast("double")


def sql_round9_dec(expr: str) -> str:
    return f"CAST(ROUND({expr}, 9) AS {DEC9})"


def sql_dsum9(expr: str) -> str:
    return sql_dec2dbl(f"SUM({sql_round9_dec(expr)})")
