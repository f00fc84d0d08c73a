"""Ledger zone maps: per-file min/max column statistics for file pruning.

The reference's stores keep *attribute indexes* that back
``UpdateGeoMesaRecord``'s non-id lookups (``UpdateGeoMesaRecord.scala:
154-166``); the lake's analogue is a zone map — per data file, the min/max
(+ null count) of chosen columns, recorded in the ledger's ``DataFile``
entries at commit time and consulted driver-side before a scan hands Spark
its file list.  A predicate whose value range excludes a file's recorded
range skips the file without opening it: an attribute-update or non-key
point query on a 10^5-file table reads only the files that can match.

Where the numbers come from: the parquet footers of the files the write
just produced — column-chunk statistics the writer already computed, read
alongside the existing per-file row-count footer pass (no extra Spark job,
no second data scan).  parquet-mr DROPS oversized binary statistics rather
than truncating them (probe-verified on this Spark build: a 5 kB string
column yields no stats), so a recorded min/max is exact; columns without
stats simply never prune.

Soundness under merge-on-read: within a bucket that holds delta files,
last-writer-wins resolution is cross-file — an older matching row in one
file may be superseded by a newer non-matching row in another.  File-level
pruning is therefore applied per BUCKET: a bucket is skipped only when NO
file in it can match; a bucket with any possible match is read whole
(then resolved, then filtered).  Buckets holding only base files contain
disjoint final rows (each CoW rewrite/compaction rewrites the bucket in
one commit), so they prune at file granularity.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable, Sequence

try:  # pyarrow is baked into the environment; used only for footer stats.
    import pyarrow.parquet as pq
except ImportError:  # pragma: no cover
    pq = None

#: predicate operators understood by the pruner (and the residual filter)
OPS = ("=", "<", "<=", ">", ">=", "in", "between")

_EPOCH = dt.datetime(1970, 1, 1)

#: cap on stored string bounds: a page-text column whose values sit under
#: parquet-mr's 4 KB stats cutoff would otherwise put two multi-KB strings
#: into EVERY ledger file entry — at 10^5 files that is ledger bloat, not
#: metadata.  Bounds stay sound: a truncated min is still <= every value;
#: a truncated max is bumped to a strict upper bound (Iceberg's approach).
MAX_STRING_STAT_LEN = 96


def _truncate_min(s: str) -> str:
    return s[:MAX_STRING_STAT_LEN]


def _truncate_max(s: str) -> str | None:
    """Shortest prefix-bump upper bound, or None (unbounded) if every
    prefix character is already the max code point."""
    if len(s) <= MAX_STRING_STAT_LEN:
        return s
    prefix = s[:MAX_STRING_STAT_LEN]
    chars = list(prefix)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp < 0x10FFFF:
            return "".join(chars[:i]) + chr(cp + 1)
    return None


def canon(value: Any):
    """Canonical comparable form of a stat/predicate value.

    Numbers stay numbers, strings stay strings, temporals become epoch
    micros (int) so a python datetime predicate compares against a parquet
    timestamp stat regardless of which side parsed it.  Returns None for
    values with no canonical form (bytes, nested) — callers treat that as
    "cannot prune".
    """
    if value is None:
        return None
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, (int, float, str)):
        return value
    if isinstance(value, dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return int((value - _EPOCH).total_seconds() * 1_000_000)
    if isinstance(value, dt.date):
        return int(
            (dt.datetime(value.year, value.month, value.day) - _EPOCH).total_seconds()
            * 1_000_000
        )
    return None


def collect_file_stats(
    path: str, columns: set[str] | None = None
) -> dict[str, dict[str, Any]] | None:
    """Read zone-map stats for one parquet file from its footer.

    Returns ``{col: {"min": x, "max": x, "nulls": n, "rows": r}}`` over the
    columns that carry usable statistics (optionally limited to
    ``columns``); min/max are canonicalized via :func:`canon`.  A column
    whose stats any row group lacks is omitted entirely — absence always
    means "cannot prune", never "no rows match".
    """
    if pq is None:  # pragma: no cover
        return None
    md = pq.ParquetFile(path).metadata
    agg: dict[str, dict[str, Any]] = {}
    dropped: set[str] = set()
    unbounded_max: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            c = g.column(i)
            name = c.path_in_schema
            if "." in name or name in dropped:
                continue  # nested leaves don't map to top-level predicates
            if columns is not None and name not in columns:
                continue
            st = c.statistics
            rows = g.num_rows
            if st is None or st.null_count is None:
                dropped.add(name)
                agg.pop(name, None)
                continue
            nulls = int(st.null_count)
            if not st.has_min_max:
                if nulls == rows:
                    # an all-null row group constrains nothing beyond nulls
                    mn = mx = None
                else:
                    dropped.add(name)
                    agg.pop(name, None)
                    continue
            else:
                mn, mx = canon(st.min), canon(st.max)
                if (mn is None) != (st.min is None) or (mx is None) != (st.max is None):
                    # value kind we can't canonicalize (e.g. raw bytes)
                    dropped.add(name)
                    agg.pop(name, None)
                    continue
                if isinstance(mn, str):
                    mn = _truncate_min(mn)
                if isinstance(mx, str):
                    mx = _truncate_max(mx)
                    if mx is None:
                        # prefix-bump impossible: the max is unbounded for
                        # this column, now and for every later row group
                        unbounded_max.add(name)
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"min": mn, "max": mx, "nulls": nulls, "rows": rows}
            else:
                if mn is not None:
                    cur["min"] = mn if cur["min"] is None else min(cur["min"], mn)
                if mx is not None and name not in unbounded_max:
                    cur["max"] = mx if cur["max"] is None else max(cur["max"], mx)
                cur["nulls"] += nulls
                cur["rows"] += rows
    for name in unbounded_max:
        if name in agg:
            agg[name]["max"] = None
    return agg or None


def _col_matches(cs: dict[str, Any], op: str, value) -> bool:
    """May any row of a file match ``col op value`` given its column stats?"""
    if op == "in":
        return any(_col_matches(cs, "=", v) for v in value)
    if op == "between":
        lo, hi = value
        return _col_matches(cs, ">=", lo) and _col_matches(cs, "<=", hi)
    v = canon(value)
    if v is None:
        return True  # un-canonicalizable predicate value: cannot prune
    mn, mx = cs.get("min"), cs.get("max")
    if mn is None and mx is None:
        # all-null column: no non-null value can match any comparison
        return not (cs.get("nulls", 0) == cs.get("rows", 0) and cs.get("rows", 0) > 0)
    try:
        if op == "=":
            return (mn is None or mn <= v) and (mx is None or v <= mx)
        if op == "<":
            return mn is None or mn < v
        if op == "<=":
            return mn is None or mn <= v
        if op == ">":
            return mx is None or mx > v
        if op == ">=":
            return mx is None or mx >= v
    except TypeError:
        return True  # mixed types: cannot prune
    raise ValueError(f"unknown predicate op {op!r} (expected one of {OPS})")


def file_may_match(
    stats: dict[str, dict[str, Any]] | None, preds: Sequence[tuple[str, str, Any]]
) -> bool:
    """True unless some predicate's range provably excludes the file."""
    if not preds:
        return True
    if stats is None:
        return True
    for col, op, value in preds:
        cs = stats.get(col)
        if cs is None:
            continue  # no stats for this column: cannot prune on it
        if not _col_matches(cs, op, value):
            return False
    return True


def prune_files(
    files: Iterable,
    preds: Sequence[tuple[str, str, Any]],
    num_buckets: int | None = None,
) -> list:
    """Zone-map pruning over ledger ``DataFile`` entries, bucket-sound.

    Base-only buckets prune per file; buckets containing delta files are
    all-or-nothing (see module docstring for why cross-file LWW resolution
    makes per-file pruning unsound there).  ``num_buckets`` (the snapshot's
    current modulus) makes the grouping lazy-rescale aware: a file stamped
    with an old modulus belongs to the LWW-resolution group of every
    current bucket it covers, so it is kept whenever any of those groups
    must be read whole.
    """
    files = list(files)
    if not preds:
        return files
    # group files by the CURRENT buckets they cover; without a modulus the
    # label is the group (the pre-lazy-rescale fast path)
    by_bucket: dict[int, list] = {}
    for f in files:
        m = getattr(f, "modulus", None)
        if num_buckets is not None and m is not None and m != num_buckets:
            for cb in range(f.bucket, num_buckets, m):
                by_bucket.setdefault(cb, []).append(f)
        else:
            by_bucket.setdefault(f.bucket, []).append(f)
    keep_ids: set[int] = set()
    out: list = []
    for fs in by_bucket.values():
        if any(f.kind == "delta" for f in fs):
            if any(file_may_match(f.stats, preds) for f in fs):
                survivors = fs
            else:
                survivors = []
        else:
            survivors = [f for f in fs if file_may_match(f.stats, preds)]
        for f in survivors:
            if id(f) not in keep_ids:  # a covering file may sit in k groups
                keep_ids.add(id(f))
                out.append(f)
    return out


def predicate_column(preds: Sequence[tuple[str, str, Any]]):
    """Build the residual Spark filter Column for a predicate conjunction.

    Pruning is an optimization; correctness always comes from applying the
    same predicate to the surviving rows.
    """
    from pyspark.sql import functions as F

    for _col, op, _v in preds:
        if op not in OPS:
            raise ValueError(f"unknown predicate op {op!r} (expected one of {OPS})")
    cond = None
    for col, op, value in preds:
        c = F.col(col)
        if op == "=":
            term = c == F.lit(value)
        elif op == "<":
            term = c < F.lit(value)
        elif op == "<=":
            term = c <= F.lit(value)
        elif op == ">":
            term = c > F.lit(value)
        elif op == ">=":
            term = c >= F.lit(value)
        elif op == "in":
            term = c.isin(list(value))
        elif op == "between":
            term = (c >= F.lit(value[0])) & (c <= F.lit(value[1]))
        else:
            raise ValueError(f"unknown predicate op {op!r} (expected one of {OPS})")
        cond = term if cond is None else (cond & term)
    return cond
