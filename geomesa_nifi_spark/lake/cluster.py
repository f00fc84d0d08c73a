"""Z-order / linear clustering for compaction: file layouts that make
zone maps prune on NON-key attribute predicates.

The write path sorts each bucket by the table key, so key-range zone maps
are tight but every file spans the full range of every other column — an
attribute predicate (``update_by_attribute``, ``scan(where=...)``) prunes
nothing inside a touched bucket.  The reference leans on store-side
attribute indexes for those lookups (``UpdateGeoMesaRecord.scala:154-166``);
a lakehouse's equivalent lever is CLUSTERED compaction (Delta's ``OPTIMIZE
ZORDER BY``): rewrite each bucket ordered by the queried attributes so each
output file covers a narrow slice of their value space, and the per-file
min/max already recorded in the ledger (``lake/stats.py``) starts excluding
files.

Spark-first shape: clustering is a SORT EXPRESSION handed to the existing
bucket-partitioned writer — no extra shuffle beyond the one the write
already does, no Python in the row path.  Discretization is driver-side
metadata (quantile boundaries / dictionary ranks from one bounded job);
the per-row expression is built-ins only (``filter``/``size`` over a
literal boundary array, bit shifts for the interleave), so the whole thing
stays inside the JVM.

- one column  → linear clustering: sort by the raw column (strictly the
  tightest possible per-file ranges for that column);
- k columns → Z-order: each column discretized to ``bits`` quantile ranks
  (equi-depth, so skew cannot collapse the curve), ranks bit-interleaved
  into one long sort key.  Every clustered column's per-file range narrows
  by ~2^(bits/k) instead of one column taking everything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: rank resolution per column: 8 bits = 256 equi-depth cells, plenty to
#: split a bucket's handful-to-hundreds of files while keeping the literal
#: boundary arrays small (255 values/column in the plan)
DEFAULT_BITS = 8

#: refuse dictionary-ranking a string column with more distinct values —
#: the rank map is a driver-built literal; past this it is not metadata.
#: (High-cardinality strings cluster poorly anyway; cluster on a numeric
#: or temporal proxy instead.)
MAX_STRING_DICT = 4096

_NUMERIC = ("integer", "long", "short", "byte", "float", "double", "decimal")


class ClusteringError(ValueError):
    pass


def _rank_expr(df: DataFrame, col: str, bits: int) -> Column:
    """Expression mapping ``col`` to an equi-depth rank in [0, 2^bits - 1].

    Numeric/temporal: approxQuantile boundaries (one driver job over the
    column, relative error 1/2^(bits+2)); temporals quantile on epoch
    micros.  String: sorted-distinct dictionary rank, bounded by
    MAX_STRING_DICT.  Nulls rank 0 (sort first, like NULLS FIRST).
    """
    dtype = df.schema[col].dataType
    n_cells = 1 << bits
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        src = F.unix_micros(F.col(col).cast("timestamp"))
        probe = df.select(src.alias("_c"))
    elif dtype.typeName().startswith(_NUMERIC):
        src = F.col(col).cast("double")
        probe = df.select(src.alias("_c"))
    elif isinstance(dtype, T.StringType):
        distinct = [
            r[0]
            for r in df.select(col)
            .where(F.col(col).isNotNull())
            .distinct()
            .limit(MAX_STRING_DICT + 1)
            .collect()
        ]
        if len(distinct) > MAX_STRING_DICT:
            raise ClusteringError(
                f"cluster column {col!r} has > {MAX_STRING_DICT} distinct "
                f"strings; dictionary ranking would not be metadata-sized — "
                f"cluster on a numeric/temporal proxy instead"
            )
        ranks = {
            v: int(i * (n_cells - 1) / max(len(distinct) - 1, 1))
            for i, v in enumerate(sorted(distinct))
        }
        if not ranks:
            return F.lit(0)
        mapping = F.create_map(
            *[F.lit(x) for kv in ranks.items() for x in kv]
        )
        return F.coalesce(mapping[F.col(col)], F.lit(0))
    else:
        raise ClusteringError(
            f"cluster column {col!r} has unsupported type {dtype.simpleString()}"
        )

    probes = [i / n_cells for i in range(1, n_cells)]
    bounds = probe.approxQuantile("_c", probes, 1.0 / (n_cells * 4))
    # dedupe: repeated boundaries (heavy hitters) would count multiple cells
    # for one value; strictly-increasing bounds keep ranks equi-depth-ish
    uniq: list[float] = []
    for b in bounds:
        if b is not None and (not uniq or b > uniq[-1]):
            uniq.append(b)
    if not uniq:
        return F.lit(0)
    arr = F.array([F.lit(b) for b in uniq])
    # rank = number of boundaries <= value; null comparisons filter out -> 0
    return F.size(F.filter(arr, lambda b: b <= src))


def cluster_sort_exprs(
    df: DataFrame, cluster_by: list[str], bits: int = DEFAULT_BITS
) -> list[Column]:
    """Sort expressions realizing the clustering — hand these to
    ``sortWithinPartitions`` after the bucket column.

    One column: the raw column (linear).  Several: one interleaved Z-value
    (rank bits of column j land at positions ``i * k + j``, so all columns
    share significance evenly).
    """
    missing = [c for c in cluster_by if c not in df.columns]
    if missing:
        raise ClusteringError(f"cluster columns not in schema: {missing}")
    if not cluster_by:
        raise ClusteringError("cluster_by must name at least one column")
    if len(cluster_by) == 1:
        return [F.col(cluster_by[0])]
    k = len(cluster_by)
    if bits * k > 62:
        raise ClusteringError(
            f"{k} columns x {bits} bits exceeds the 63-bit Z-value budget"
        )
    ranks = [_rank_expr(df, c, bits).cast("long") for c in cluster_by]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return [z]
