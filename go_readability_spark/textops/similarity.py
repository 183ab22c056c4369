"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query side is tiny and broadcast; the candidate scan is map-side
  (zip_with dot product in codegen'd JVM expressions), the only shuffle
  is the per-query top-k window.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane (sign-bit)
  bucketing; queries only compare against candidates in the same bucket,
  so the join key prunes the pair space by ~2^nbits.

Float→double casts happen before any arithmetic and the fold order is the
sequential left fold in BOTH engines, so oracle values match bit-for-bit
(rounded to 6 decimals as a belt-and-braces guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_QUERIES = 8       # vec_id < N_QUERIES form the query set
TOP_K = 5
LSH_PLANES = 3      # sign bits of the first LSH_PLANES dims


_DOT = (
    "aggregate(zip_with(qe, ce, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate({col}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def _with_cosine(pairs: DataFrame) -> DataFrame:
    return pairs.withColumn(
        "cosine",
        F.round(
            F.expr(_DOT)
            / (F.expr(_NORM.format(col="qe")) * F.expr(_NORM.format(col="ce"))),
            6,
        ),
    )


def cosine_topk(embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = _with_cosine(F.broadcast(q).crossJoin(c))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _duck_cos(qe: str = "a.embedding", ce: str = "b.embedding") -> str:
    dot = (
        f"list_reduce(list_transform(range(1, len({qe}) + 1),"
        f" i -> CAST({qe}[i] AS DOUBLE) * CAST({ce}[i] AS DOUBLE)), (x, y) -> x + y)"
    )
    nq = (
        f"sqrt(list_reduce(list_transform({qe}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),"
        " (x, y) -> x + y))"
    )
    nc = (
        f"sqrt(list_reduce(list_transform({ce}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),"
        " (x, y) -> x + y))"
    )
    # DECIMAL cast reproduces Spark's HALF_UP double rounding semantics
    return f"CAST(round(CAST({dot} / ({nq} * {nc}) AS DECIMAL(28,12)), 6) AS DOUBLE)"


def cosine_topk_oracle_sql(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    return f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_duck_cos()} AS cosine
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < {n_queries} AND b.vec_id >= {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""


# testdata embeddings are well-spread (max pairwise cosine ≈ 0.51); 0.42
# yields a meaningful near-dup candidate set at every sf
NEAR_DUP_THRESHOLD = 0.42


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = NEAR_DUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥ τ,
    blocked on the sign-bit LSH bucket so the pair space is pruned ~2^bits
    before any dot product (the classic scale move for O(n²) similarity).
    """
    bucketed = embeddings.withColumn("bucket", F.expr(_bucket_expr_spark()))
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("qe"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("ce"), "bucket"
    )
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        _with_cosine(pairs)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_dup_pairs_oracle_sql(threshold: float = NEAR_DUP_THRESHOLD) -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {{bucket}} AS bucket FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         {_duck_cos('a.embedding', 'b2.embedding')} AS cosine
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT vec_a, vec_b, cosine FROM pairs
WHERE cosine >= {threshold} ORDER BY vec_a, vec_b
""".format(bucket=_bucket_expr_duck("embedding"))


def _bucket_expr_spark() -> str:
    terms = " + ".join(
        f"(CASE WHEN cast(element_at(embedding, {i + 1}) as double) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_PLANES)
    )
    return f"({terms})"


def _bucket_expr_duck(col: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN CAST({col}[{i + 1}] AS DOUBLE) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_PLANES)
    )
    return f"({terms})"


def lsh_bucketed_topk(
    embeddings: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K
) -> DataFrame:
    """ANN: same-bucket candidates only — equi-join on the bucket id
    replaces the cross join (at scale: shuffle on a small int key, prunable
    and AQE-balanced).  Recall < 1 by construction; the oracle implements
    the identical bucketing, so values still match exactly."""
    bucketed = embeddings.withColumn("bucket", F.expr(_bucket_expr_spark()))
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    c = bucketed.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"), "bucket"
    )
    scored = _with_cosine(F.broadcast(q).join(c, "bucket"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
        .orderBy("query_id", "rank")
    )


def lsh_bucketed_topk_oracle_sql(n_queries: int = N_QUERIES, k: int = TOP_K) -> str:
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_expr_duck('embedding')} AS bucket FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b2.vec_id AS neighbor_id,
         {_duck_cos('a.embedding', 'b2.embedding')} AS cosine
  FROM b a JOIN b b2 ON a.bucket = b2.bucket
  WHERE a.vec_id < {n_queries} AND b2.vec_id >= {n_queries}
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
"""
