"""Similarity search over embedding columns (array<float>).

Brute-force top-k as the exact baseline, and a random-hyperplane-LSH
bucketed variant as the scale path. Scale notes:

* The score is computed with built-in higher-order functions
  (``zip_with`` + ``aggregate``) — JVM-side, no Python, no UDF.
* Brute force is a broadcast nested-loop of the (small) query set against
  the (huge) corpus: the corpus never shuffles; per-partition top-k is
  cut down by the ranking window only after the broadcast join.
* The LSH variant buckets corpus vectors by sign-pattern of R random
  hyperplanes; queries probe only their own bucket — candidate count drops
  ~2^R-fold, then exact re-ranking inside the bucket.

Determinism: scores are computed on floor-quantized int64 components
(``floor(x*1000)``), making ranking reproducible across engines (float32
summation order would not be) — the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 1000  # fixed-point quantization for cross-engine-exact scores

_SPARK_QDOT = (
    "aggregate(zip_with(a.embedding, b.embedding, "
    f"(x, y) -> cast(floor(x * {QUANT}) as bigint) * cast(floor(y * {QUANT}) as bigint)), "
    "0L, (acc, v) -> acc + v)"
)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (excluding itself).

    ``queries`` is expected small (it is broadcast); the corpus side streams
    through the nested-loop join without shuffling.
    """
    pairs = F.broadcast(queries.alias("a")).crossJoin(embeddings.alias("b")).filter(
        F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("query_id"),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        F.expr(_SPARK_QDOT).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qdot")
    )


def brute_force_topk_oracle_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {n_queries}),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(floor(p[1] * {QUANT}) AS BIGINT)
                         * CAST(floor(p[2] * {QUANT}) AS BIGINT))) AS qdot
      FROM q a JOIN embeddings b ON a.vec_id != b.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, qdot FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ------------------------------------------------------- LSH-bucketed ANN
LSH_PLANES = 4  # 2^4 buckets; deterministic pseudo-hyperplanes


def _plane_expr(p: int) -> str:
    """Sign of a deterministic pseudo-random projection: plane p weights
    component i by cos(p*31 + i*7) — fixed, engine-independent math."""
    return (
        f"(case when aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), "
        f"(x, i) -> cast(x as double) * cos(cast({p} * 31 + i * 7 as double))), "
        f"cast(0.0 as double), (acc, v) -> acc + v) >= 0 then 1 else 0 end)"
    )


def lsh_bucket(embeddings: DataFrame) -> DataFrame:
    """Assign each vector a 2^LSH_PLANES-way bucket by hyperplane signs."""
    bucket = " + ".join(f"{_plane_expr(p)} * {1 << p}" for p in range(LSH_PLANES))
    return embeddings.withColumn("bucket", F.expr(bucket).cast("int"))


def lsh_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """ANN top-k: probe only the query's own LSH bucket, exact re-rank inside.
    Equi-join on bucket -> shuffle moves ~1/2^R of the corpus per query."""
    corpus_b = lsh_bucket(embeddings).alias("b")
    queries_b = lsh_bucket(queries).alias("a")
    pairs = queries_b.join(
        corpus_b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("query_id"),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        F.expr(_SPARK_QDOT).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qdot")
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, id_col: str = "vec_id"
) -> DataFrame:
    """Float cosine variant (production scoring; not oracle-exact because
    float32 summation differs across engines — use rank-only comparisons)."""
    dot = "aggregate(zip_with(a.embedding, b.embedding, (x,y) -> cast(x as double)*cast(y as double)), cast(0.0 as double), (acc,v) -> acc+v)"
    nrm = (
        lambda s: f"sqrt(aggregate(transform({s}.embedding, x -> cast(x as double)*cast(x as double)), cast(0.0 as double), (acc,v) -> acc+v))"
    )
    pairs = F.broadcast(queries.alias("a")).crossJoin(embeddings.alias("b")).filter(
        F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("query_id"),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        F.expr(f"({dot}) / ({nrm('a')} * {nrm('b')})").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
