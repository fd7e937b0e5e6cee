"""Similarity search over embedding columns (SURVEY.md §2.11).

Baseline: brute-force cosine top-k — broadcast the (small) query set, dot
products via ``zip_with``/``aggregate`` array expressions (JVM, codegen'd,
no Python), window top-k per query. The scale path: LSH bucketing
(random hyperplane signatures, Charikar 2002) so candidate pairs come from
an equi-join on bucket signature instead of a full cross product; an IVF
variant (k-means coarse quantizer via pyspark.ml) slots in the same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_unit_norm(df: DataFrame, vec_col: str = "embedding",
                   out_col: str = "unit_vec") -> DataFrame:
    """Pre-normalize vectors (cast float→double once) so cosine = dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return df.withColumn(out_col, F.when(n > 0, F.transform(v, lambda x: x / n)))


def cosine_topk(base: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest base
    vectors (excluding itself when ids collide).

    ``queries`` is expected small → broadcast nested-loop join streams the
    base side once; per-row cost is one fused array dot product. Output:
    (query_id, vec_id, cosine, rank) with deterministic tiebreak on vec_id.
    """
    b = with_unit_norm(base, vec_col, "unit_b").select(
        F.col(id_col), F.col("unit_b"))
    q = with_unit_norm(queries, vec_col, "unit_q").select(
        F.col(query_id_col), F.col("unit_q"))
    scored = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", F.round(_dot(F.col("unit_b"), F.col("unit_q")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def hyperplane_lsh_buckets(df: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding", n_planes: int = 16,
                           seed: int = 42, dim: int = 64) -> DataFrame:
    """Random-hyperplane LSH signature per vector: bit i = sign(v·r_i).

    Vectors sharing a signature are cosine-similar with high probability;
    near-neighbor search becomes a groupBy/equi-join on ``bucket`` — the
    100 TB-safe candidate generator (no cross product). Multiple tables
    (different seeds) trade recall for cost.
    """
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in p])
        bits.append(F.when(_dot(v, plane) >= 0,
                           F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return df.select(F.col(id_col), sig.alias("bucket"))


def lsh_cosine_topk(base: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", n_planes: int = 8,
                    n_tables: int = 4, dim: int = 64) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates = base vectors sharing any
    table's bucket with the query, then exact cosine rank on candidates.

    With b bits/table and t tables, expected candidate fraction ≈
    t·2^(−b)·(collision skew) — the knob for the recall/cost tradeoff.
    """
    cands = None
    for t in range(n_tables):
        bb = hyperplane_lsh_buckets(base, id_col, vec_col, n_planes, seed=100 + t, dim=dim)
        qb = hyperplane_lsh_buckets(queries, query_id_col, vec_col, n_planes, seed=100 + t, dim=dim)
        c = bb.join(F.broadcast(qb.withColumnRenamed("bucket", "qbucket")),
                    bb["bucket"] == F.col("qbucket")).select(id_col, query_id_col)
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    b = with_unit_norm(base, vec_col, "unit_b").select(F.col(id_col), "unit_b")
    q = with_unit_norm(queries, vec_col, "unit_q").select(F.col(query_id_col), "unit_q")
    scored = (
        cands.join(b, id_col).join(F.broadcast(q), query_id_col)
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine", F.round(_dot(F.col("unit_b"), F.col("unit_q")), 6))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
