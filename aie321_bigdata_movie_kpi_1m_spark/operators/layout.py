"""Multi-dimensional layout clustering (Z-order) for data skipping.

A single sort column gives parquet min/max stats (and so row-group /
file skipping) on ONE dimension; predicates on any other column scan
everything.  Z-ordering interleaves the bits of several normalized key
columns into one sort key, so a lexicographic sort clusters rows that
are close in EVERY dimension — per-file min/max ranges stay narrow on
all participating columns and scans with predicates on any of them
skip most files.  This is the layout lever lakehouse engines (Delta
OPTIMIZE ZORDER BY, Iceberg sort orders) apply at 100 TB; here it is
a pure-DataFrame expression (bit arithmetic, JVM-evaluated, no UDF)
feeding an ordinary sorted write.

The interleave is a static expression tree (``bits`` OR-shift terms per
column), so Catalyst folds it into whole-stage codegen; the companion
range partitioner is Spark's own ``repartitionByRange`` on the z-value,
which samples quantiles distributively — no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into a Z-value.

    Columns must already be normalized to non-negative ints in
    ``[0, 2**bits)`` (use :func:`normalize_to_bits`); values outside the
    range are masked to their low bits.  With ``d`` columns the result
    occupies ``d * bits`` bits: column ``c``'s bit ``k`` lands at output
    position ``k * d + c`` — the standard Morton layout.
    """
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits exceeds a signed 64-bit key")
    z = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        masked = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for k in range(bits):
            bit = F.shiftright(masked, k).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, k * d + c_idx)
    return z


def reduce_wide_key(col: Column, *, keep_bits: int = 53) -> Column:
    """Pre-reduce a wide integer key to ``keep_bits`` significant bits
    (sign-cleared, top bits kept) so :func:`normalize_to_bits`'s double
    arithmetic stays exact.

    Hash-derived long keys (xxhash64 ids) span the full 64-bit range;
    IEEE doubles hold only 53 mantissa bits, so normalizing them raw
    loses low-order bits silently and rows near cell boundaries can land
    in the wrong file.  Keeping the TOP bits preserves ordering (what
    Z-clustering needs); the discarded low bits only distinguish rows
    that would share a cell anyway at any practical ``bits``.
    """
    if not 1 <= keep_bits <= 62:
        raise ValueError("keep_bits must be in [1, 62]")
    # unsigned shift keeps exactly keep_bits bits, is non-negative, and is
    # monotone in the key's unsigned interpretation
    return F.shiftrightunsigned(col.cast("long"), 64 - keep_bits)


def normalize_to_bits(col: Column, lo: Column | int, hi: Column | int, *, bits: int = 16) -> Column:
    """Scale a numeric column to an integer in ``[0, 2**bits)`` given its
    min/max.  ``lo``/``hi`` may be literals or (broadcast) columns — at
    scale they come from a one-row stats pass, never hard-coded.
    Degenerate ranges (hi == lo) map to 0.

    The scaling runs in IEEE double (53 mantissa bits): integer keys with
    magnitude beyond 2^53 — e.g. xxhash64-derived ids — lose low-order
    bits silently, which can push boundary rows into the wrong cell.
    Pass such keys through :func:`reduce_wide_key` first.
    """
    lo_c = F.lit(lo) if isinstance(lo, (int, float)) else lo
    hi_c = F.lit(hi) if isinstance(hi, (int, float)) else hi
    span = hi_c - lo_c
    top = F.lit((1 << bits) - 1)
    scaled = F.when(span <= 0, F.lit(0)).otherwise(
        F.floor((col - lo_c) / span * top)
    )
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), top.cast("long"))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 16,
) -> DataFrame:
    """Assign every row a target file under a Z-ordered layout.

    Adds ``__z`` (the interleaved key over min/max-normalized ``cols``)
    and ``__file_id`` — the TOP ``log2(n_files)`` bits of the Z-value,
    i.e. the row's cell in the depth-``log2(n_files)/d`` quad-tree.
    That makes assignment a pure map-side expression after one broadcast
    stats row: no global sort, no window, no shuffle (``ntile`` over a
    global order would be a SinglePartition sort — the exact shape the
    plan-quality gates reject).  Cell row-counts track data density; a
    write path wanting equal-SIZED files instead uses
    ``repartitionByRange(n_files, "__z")``, which samples range bounds
    distributively.  ``n_files`` must be a power of two.
    """
    if n_files & (n_files - 1) or n_files <= 0:
        raise ValueError("n_files must be a power of two")
    d = len(cols)
    shift = d * bits - n_files.bit_length() + 1
    stats = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    with_stats = df.join(F.broadcast(stats))
    z = zorder_value(
        [
            normalize_to_bits(
                F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits=bits
            )
            for c in cols
        ],
        bits=bits,
    )
    return (
        with_stats.withColumn("__z", z)
        .withColumn("__file_id", F.shiftright(F.col("__z"), shift))
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )
