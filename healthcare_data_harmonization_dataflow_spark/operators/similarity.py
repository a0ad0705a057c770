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
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(qdot AS BIGINT) AS qdot FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ------------------------------------------------------- LSH-bucketed ANN
LSH_PLANES = 4  # 2^4 buckets; deterministic pseudo-hyperplanes
LSH_DIM = 64  # embedding dimensionality of the documents/embeddings tables


def _plane_weights(p: int, dim: int = LSH_DIM) -> list[int]:
    """Integer weights of pseudo-hyperplane ``p``: a fixed LCG stream, so
    both engines receive the SAME literal array — no runtime hashing, no
    transcendental functions whose last-ulp rounding could differ between
    engines and flip a sign."""
    state = (p * 2654435761 + 1013904223) & 0x7FFFFFFF
    out = []
    for _ in range(dim):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(state % 2001 - 1000)
    return out


def _plane_dot(p: int, dim: int) -> str:
    """Integer projection of a quantized vector onto plane p (Spark SQL).
    floor(x*QUANT) quantization keeps everything in exact int64 math."""
    ws = ", ".join(str(w) for w in _plane_weights(p, dim))
    return (
        f"aggregate(zip_with(embedding, array({ws}), "
        f"(x, w) -> cast(floor(x * {QUANT}) as bigint) * w), 0L, (acc, v) -> acc + v)"
    )


def _plane_dot_duck(p: int, dim: int) -> str:
    ws = ", ".join(str(w) for w in _plane_weights(p, dim))
    return (
        f"list_sum(list_transform(list_zip(embedding, [{ws}]), "
        f"pr -> CAST(floor(pr[1] * {QUANT}) AS BIGINT) * pr[2]))"
    )


def lsh_bucket(embeddings: DataFrame, dim: int = LSH_DIM) -> DataFrame:
    """Assign each vector a 2^LSH_PLANES-way bucket by hyperplane signs.
    Exact integer math — reproducible on any engine, any partitioning.

    The plane weights ride in as a broadcast ONE-ROW table instead of
    LSH_PLANES*dim inline literals: the literal form generated hundreds of
    constants into whole-stage codegen and was observed to compile 10-50x
    slower under JIT code-cache pressure late in a long session."""
    spark = embeddings.sparkSession
    weights = [_plane_weights(p, dim) for p in range(LSH_PLANES)]
    wdf = spark.createDataFrame([(weights,)], "_lshw array<array<bigint>>")
    bucket = " + ".join(
        f"(case when aggregate(zip_with(embedding, _lshw[{p}], "
        f"(x, w) -> cast(floor(x * {QUANT}) as bigint) * w), 0L, "
        f"(acc, v) -> acc + v) >= 0 then {1 << p} else 0 end)"
        for p in range(LSH_PLANES)
    )
    return (
        embeddings.crossJoin(F.broadcast(wdf))
        .withColumn("bucket", F.expr(bucket).cast("int"))
        .drop("_lshw")
    )


def lsh_bucket_duck_expr(dim: int = LSH_DIM) -> str:
    """The DuckDB expression computing the same bucket id."""
    return " + ".join(
        f"(CASE WHEN {_plane_dot_duck(p, dim)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(LSH_PLANES)
    )


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


def lsh_topk_oracle_sql(k: int = 5, n_queries: int = 10, dim: int = LSH_DIM) -> str:
    """DuckDB oracle reproducing lsh_topk exactly (same integer buckets,
    same quantized scores, same tie-break)."""
    b = lsh_bucket_duck_expr(dim)
    return f"""
    WITH bucketed AS (SELECT *, {b} AS bucket FROM embeddings),
    q AS (SELECT * FROM bucketed WHERE vec_id < {n_queries}),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(floor(p[1] * {QUANT}) AS BIGINT)
                         * CAST(floor(p[2] * {QUANT}) AS BIGINT))) AS qdot
      FROM q a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(qdot AS BIGINT) AS qdot FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ------------------------------------------------- embedding near-dup pairs
def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold_ppm: int = 900_000,
    id_col: str = "vec_id",
    dim: int = LSH_DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors in the SAME LSH bucket
    whose cosine similarity reaches ``threshold_ppm`` (parts per million).

    LSH blocking is the scale path (the bucket equi-join moves ~1/2^R of
    the corpus per bucket; no full-corpus cross join); verification inside a
    bucket is exact. Cross-engine exactness of the score: components
    quantize to int64 (floor(x*QUANT)); dot and squared norms are integer;
    the only float steps are one product, one IEEE-correctly-rounded sqrt,
    one division and one floor — all exactly rounded, hence bit-identical
    on any IEEE-754 engine. Zero-norm vectors never pair.
    """
    b = lsh_bucket(embeddings, dim)
    qnorm = (
        f"aggregate(transform(embedding, x -> cast(floor(x * {QUANT}) as bigint) "
        f"* cast(floor(x * {QUANT}) as bigint)), 0L, (acc, v) -> acc + v)"
    )
    withn = b.withColumn("qn", F.expr(qnorm))
    a, c = withn.alias("a"), withn.alias("b")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col("a.qn") > 0)
        & (F.col("b.qn") > 0),
    ).select(
        F.col(f"a.{id_col}").alias("vec1"),
        F.col(f"b.{id_col}").alias("vec2"),
        F.expr(_SPARK_QDOT).alias("qdot"),
        (F.col("a.qn") * F.col("b.qn")).alias("nprod"),
    )
    scored = pairs.withColumn(
        "cosine_ppm",
        F.floor(F.col("qdot") * 1000000.0 / F.sqrt(F.col("nprod").cast("double"))).cast(
            "long"
        ),
    )
    return scored.filter(F.col("cosine_ppm") >= threshold_ppm).select(
        "vec1", "vec2", "cosine_ppm"
    )


def embedding_cosine_pairs_oracle_sql(
    threshold_ppm: int = 900_000, dim: int = LSH_DIM
) -> str:
    b = lsh_bucket_duck_expr(dim)
    qn = (
        f"list_sum(list_transform(embedding, x -> CAST(floor(x * {QUANT}) AS BIGINT)"
        f" * CAST(floor(x * {QUANT}) AS BIGINT)))"
    )
    return f"""
    WITH bucketed AS (SELECT *, {b} AS bucket, {qn} AS qn FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec1, b.vec_id AS vec2,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(floor(p[1] * {QUANT}) AS BIGINT)
                         * CAST(floor(p[2] * {QUANT}) AS BIGINT))) AS qdot,
             a.qn * b.qn AS nprod
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id AND a.qn > 0 AND b.qn > 0
    )
    SELECT vec1, vec2,
           CAST(floor(qdot * 1000000.0 / sqrt(CAST(nprod AS DOUBLE))) AS BIGINT)
             AS cosine_ppm
    FROM pairs
    WHERE floor(qdot * 1000000.0 / sqrt(CAST(nprod AS DOUBLE))) >= {threshold_ppm}
    """
