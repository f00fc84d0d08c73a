"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, dot products via ``zip_with``/``aggregate`` (JVM
  expressions, no Python), rank with a window.  The correctness baseline.
* ``rhp_ann_topk`` — the scale path: random-hyperplane LSH.  Deterministic
  ±1 hyperplanes derived from xxhash64 bucket the corpus; only same-bucket
  (plus optional multi-probe) pairs get exact scoring.  At 10^9 vectors the
  bucket join replaces the O(Q×N) cross product.

Ranking is by (rounded sim desc, vec_id asc) so results are stable across
engines and float summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` ids."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    # Queries are tiny by construction: broadcast them so the corpus never
    # shuffles — the scan streams once through a BroadcastNestedLoopJoin.
    j = corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    sim = F.round(_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))), round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def rhp_signature(vec, planes: int, dim: int, seed: int = 13):
    """LSH bucket id: sign bits of ``planes`` deterministic ±1 hyperplanes.

    plane[p][i] = +1 if xxhash64(seed, p, i) is even else -1 — generated in
    the expression itself, so executors need no side data at any scale.
    """
    def _signed(p: int):
        # closure factory: a default-arg lambda would change the UDF arity
        return lambda x, i: x * F.when(
            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), 2) == 0, 1.0
        ).otherwise(-1.0)

    sig = None
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), _signed(p)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bit = F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig + term
    return sig


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    bucketed: bool = False,
    planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >= t).

    ``bucketed=False``: exact pairwise — the verifier/baseline.
    ``bucketed=True``: RHP-LSH candidates (same-bucket only) then exact
    cosine — the linear-ish scale path, same candidate->verify shape as
    MinHash dedup.  Note RHP bucketing at ``planes`` bits has recall < 1
    for moderate thresholds; production runs multiple probe tables.
    """
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    if bucketed:
        corpus = corpus.withColumn("bucket", rhp_signature(F.col("vec"), planes, dim))
    a = corpus.select(*[F.col(c).alias(f"a_{c}") for c in corpus.columns])
    b = corpus.select(*[F.col(c).alias(f"b_{c}") for c in corpus.columns])
    cond = F.col("a_vec_id") < F.col("b_vec_id")
    if bucketed:
        cond = cond & (F.col("a_bucket") == F.col("b_bucket"))
    j = a.join(b, cond)
    sim = F.round(
        _dot(F.col("a_vec"), F.col("b_vec")) / (_norm(F.col("a_vec")) * _norm(F.col("b_vec"))),
        round_to,
    )
    return (
        j.select(
            F.col("a_vec_id").alias("vec_a"),
            F.col("b_vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def rhp_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = same RHP bucket, then exact cosine."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("bucket", rhp_signature(F.col("vec"), planes, dim))
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), F.col("bucket")
    )
    j = corpus.join(F.broadcast(queries), ["bucket"]).filter(F.col("vec_id") != F.col("query_id"))
    sim = F.round(_dot(F.col("qvec"), F.col("vec")) / (_norm(F.col("qvec")) * _norm(F.col("vec"))), round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )
