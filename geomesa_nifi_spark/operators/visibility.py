"""Row-level security: Accumulo-style visibility expressions.

The reference carries a per-feature visibility string (converter option
``visibilities-col`` — ``records/package.scala:148-158``,
``SimpleFeatureRecordConverter.scala:110-115``) which the backing stores
enforce at read time against the caller's authorizations.  This module
brings the same contract to the lake: a ``vis`` column holds expressions
like ``"user"`` / ``"user&admin"`` / ``"(alpha|beta)&ops"`` and
``filter_by_auths`` keeps only rows the auth set satisfies.

Scale shape: visibility *strings* have tiny cardinality (labels, not data),
so evaluation runs driver-side over ``collect_set`` of distinct strings and
the scan filters with a broadcast ``isin`` — zero Python in the row path,
full predicate pushdown for the common single-label case.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"\s*(?:(?P<and>&)|(?P<or>\|)|(?P<lp>\()|(?P<rp>\))|(?P<label>[A-Za-z0-9_.:-]+))")


class VisibilityError(ValueError):
    pass


def evaluate(expression: str | None, auths: set[str]) -> bool:
    """Evaluate one visibility expression against an auth set.

    Empty/null expression => visible to everyone (reference semantics:
    unlabelled rows are unrestricted).
    """
    if expression is None or not expression.strip():
        return True
    tokens = []
    pos = 0
    while pos < len(expression):
        m = _TOKEN.match(expression, pos)
        if not m or m.end() == pos:
            raise VisibilityError(f"bad visibility syntax at {expression[pos:]!r}")
        pos = m.end()
        tokens.append((m.lastgroup, m.group(m.lastgroup)))

    def parse_or(i):
        val, i = parse_and(i)
        while i < len(tokens) and tokens[i][0] == "or":
            rhs, i = parse_and(i + 1)
            val = val or rhs
        return val, i

    def parse_and(i):
        val, i = parse_atom(i)
        while i < len(tokens) and tokens[i][0] == "and":
            rhs, i = parse_atom(i + 1)
            val = val and rhs
        return val, i

    def parse_atom(i):
        if i >= len(tokens):
            raise VisibilityError(f"truncated expression: {expression!r}")
        kind, text = tokens[i]
        if kind == "label":
            return text in auths, i + 1
        if kind == "lp":
            val, i = parse_or(i + 1)
            if i >= len(tokens) or tokens[i][0] != "rp":
                raise VisibilityError(f"unbalanced parens in {expression!r}")
            return val, i + 1
        raise VisibilityError(f"unexpected {text!r} in {expression!r}")

    val, i = parse_or(0)
    if i != len(tokens):
        raise VisibilityError(f"trailing tokens in {expression!r}")
    return val


#: Visibility labels are Accumulo-style *policy expressions* — a dataset has
#: a handful of them, not one per row.  The driver-side distinct collect is
#: only safe under that assumption, so it is enforced: more distinct labels
#: than this is almost certainly a misconfigured column (e.g. per-row
#: unique strings) and would otherwise collect the whole column.
MAX_DISTINCT_LABELS = 10_000


def visible_expressions(df: DataFrame, auths: set[str], vis_col: str = "vis") -> list[str]:
    # LIMIT n+1 bounds the collect itself: the guard cannot OOM the driver
    # on the very dataset it is guarding against.
    distinct = [
        r[0]
        for r in df.select(vis_col).distinct().limit(MAX_DISTINCT_LABELS + 1).collect()
    ]
    if len(distinct) > MAX_DISTINCT_LABELS:
        raise VisibilityError(
            f"more than {MAX_DISTINCT_LABELS} distinct values in {vis_col!r}: "
            "visibility labels are policy expressions with tiny cardinality; "
            "a per-row-unique column here would collect the whole dataset "
            "to the driver"
        )
    return [v for v in distinct if v is not None and evaluate(v, auths)]


def filter_by_auths(df: DataFrame, auths: set[str], vis_col: str = "vis") -> DataFrame:
    """Keep rows whose visibility the auth set satisfies.

    Distinct labels are evaluated once on the driver; the row filter is a
    plain ``isin`` over that (broadcast) list — codegen'd, pushdown-able.
    """
    if vis_col not in df.columns:
        return df
    allowed = visible_expressions(df, auths, vis_col)
    cond: Column = F.col(vis_col).isNull() | (F.trim(F.col(vis_col)) == "")
    if allowed:
        cond = cond | F.col(vis_col).isin(allowed)
    return df.filter(cond)
