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
LSH_PLANES = 4  # 2^4 buckets; single-table variant (kept for diagnostics)
LSH_DIM = 64  # embedding dimensionality of the documents/embeddings tables

# Banded multi-table LSH (the scale path): LSH_BANDS independent hash
# tables, each bucketing by the sign pattern of LSH_ROWS_PER_BAND
# hyperplanes -> 2^rows buckets per band. Bucket count scales with the
# corpus (raise rows_per_band as N grows: candidate work per band is
# N^2/2^rows); recall scales with bands (a pair is a candidate if it
# collides in ANY band). Plane weights are deterministic integers, so the
# DuckDB oracle reproduces buckets and candidates bit-for-bit.
LSH_BANDS = 8
LSH_ROWS_PER_BAND = 8


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
        f"(case when aggregate(zip_with(_qe, _lshw[{p}], "
        f"(x, w) -> x * w), 0L, "
        f"(acc, v) -> acc + v) >= 0 then {1 << p} else 0 end)"
        for p in range(LSH_PLANES)
    )
    return (
        embeddings.crossJoin(F.broadcast(wdf))
        .withColumn("_qe", F.expr(_qe_expr(dim)))
        .withColumn("bucket", F.expr(bucket).cast("int"))
        .drop("_lshw", "_qe")
    )


def lsh_bucket_duck_expr(dim: int = LSH_DIM) -> str:
    """The DuckDB expression computing the same bucket id."""
    return " + ".join(
        f"(CASE WHEN {_plane_dot_duck(p, dim)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(LSH_PLANES)
    )


def _qe_expr(dim: int) -> str:
    """Quantized-int64 copy of the embedding, guarded by a dim assertion.

    The assert rides INSIDE the expression (not a dropped side column, which
    Catalyst would prune away): a vector of the wrong dimensionality fails
    the job loudly instead of null-padding every plane dot and silently
    landing in bucket 0."""
    return (
        f"case when assert_true(size(embedding) = {dim}, "
        f"'lsh: embedding dimension != {dim}') is null "
        f"then transform(embedding, x -> cast(floor(x * {QUANT}) as bigint)) end"
    )


_QDOT_QE = "aggregate(zip_with(_qa, _qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def _quantized(embeddings: DataFrame, id_col: str, dim: int) -> DataFrame:
    return embeddings.select(F.col(id_col), F.expr(_qe_expr(dim)).alias("_qe"))


def lsh_band_keys(
    embeddings: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS_PER_BAND,
    dim: int = LSH_DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exploded (id, band, bucket) keys of the banded multi-table LSH.

    Each of ``bands`` hash tables buckets a vector by the sign pattern of
    ``rows`` hyperplanes (2^rows buckets per band). Only the id + two small
    ints leave this operator — vectors never ride through the band join.
    Plane weights arrive as ONE broadcast row (array<array<array<bigint>>>),
    not inline literals (codegen pressure; see lsh_bucket docstring)."""
    spark = embeddings.sparkSession
    weights = [_plane_weights(p, dim) for p in range(bands * rows)]
    wdf = spark.createDataFrame([(weights,)], "_lshw array<array<bigint>>")
    # ONE expression with LET-BINDINGS (the transform(array(X), v -> ..)[0]
    # idiom): the quantized vector and the plane-dot array are each bound to
    # a lambda variable, so they are computed exactly ONCE per row. Spelling
    # them as withColumn intermediates instead lets CollapseProject inline
    # the full dot-array computation into the nested bucket-fold lambdas,
    # re-evaluating 64 dots for every (band, row) bit — measured at ~75 s
    # for 500 rows. Same arithmetic, O(1) tree, O(planes*dim) work per row.
    dots = (
        "transform(_lshw, pw -> aggregate(zip_with(qe, pw, "
        "(x, w) -> x * w), 0L, (acc, v) -> acc + v))"
    )
    fold = (
        f"transform(sequence(0, {bands - 1}), b -> cast("
        f"aggregate(sequence(0, {rows - 1}), 0, "
        f"(acc, r) -> acc + (case when ds[b * {rows} + r] >= 0 "
        f"then shiftleft(1, r) else 0 end)) as int))"
    )
    buckets = (
        f"transform(array({_qe_expr(dim)}), qe -> "
        f"transform(array({dots}), ds -> {fold})[0])[0]"
    )
    return (
        embeddings.crossJoin(F.broadcast(wdf))
        .withColumn("_bandbuckets", F.expr(buckets))
        .select(F.col(id_col), F.posexplode("_bandbuckets").alias("band", "bucket"))
    )


def _maybe_broadcast(df: DataFrame, small: bool) -> DataFrame:
    """Broadcast-hint the query side only when the caller vouches it is
    small; an all-pairs caller (queries ~ corpus) passes small=False and
    gets ordinary shuffle joins instead of an executor-OOM-sized hint."""
    return F.broadcast(df) if small else df


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS_PER_BAND,
    dim: int = LSH_DIM,
    small_queries: bool = True,
) -> DataFrame:
    """ANN top-k via banded LSH: a corpus vector is a candidate for a query
    iff they share a bucket in ANY band; exact integer re-rank inside the
    candidate set.

    Scale shape: the band equi-join shuffles only (id, band, bucket) triples;
    candidate id-pairs are distinct'ed BEFORE vectors are fetched, so each
    surviving pair scores exactly once. Candidate work per band is
    ~N^2/2^rows — raise ``rows`` as the corpus grows, raise ``bands`` for
    recall."""
    ck = lsh_band_keys(embeddings, bands, rows, dim, id_col)
    qk = lsh_band_keys(queries, bands, rows, dim, id_col).withColumnRenamed(
        id_col, "query_id"
    )
    cand = (
        _maybe_broadcast(qk, small_queries)
        .join(ck, ["band", "bucket"])
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
        .distinct()
    )
    qa = _maybe_broadcast(
        _quantized(queries, id_col, dim)
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_qe", "_qa"),
        small_queries,
    )
    qb = _quantized(embeddings, id_col, dim).withColumnRenamed(
        id_col, "neighbor_id"
    ).withColumnRenamed("_qe", "_qb")
    scored = (
        cand.join(qa, "query_id")
        .join(qb, "neighbor_id")
        .select("query_id", "neighbor_id", F.expr(_QDOT_QE).alias("qdot"))
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
    nrm_expr = (
        "sqrt(aggregate(transform(embedding, x -> cast(x as double)"
        "*cast(x as double)), cast(0.0 as double), (acc,v) -> acc+v))"
    )
    # norms precomputed ONCE per side (inside the cross join they would
    # re-evaluate Q*N times), and zero-norm vectors dropped on both sides:
    # 0/0 = NaN, which Spark's descending sort ranks ABOVE every real
    # cosine — a garbage vector would displace true top-k neighbors
    qn = queries.withColumn("nrm", F.expr(nrm_expr)).where(F.col("nrm") > 0)
    en = embeddings.withColumn("nrm", F.expr(nrm_expr)).where(F.col("nrm") > 0)
    pairs = F.broadcast(qn.alias("a")).crossJoin(en.alias("b")).filter(
        F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
    )
    scored = pairs.select(
        F.col(f"a.{id_col}").alias("query_id"),
        F.col(f"b.{id_col}").alias("neighbor_id"),
        (F.expr(dot) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _band_bucket_duck(band: int, rows: int, dim: int) -> str:
    """DuckDB expression for the band-``band`` bucket id over column qe."""
    bits = []
    for r in range(rows):
        ws = ", ".join(str(w) for w in _plane_weights(band * rows + r, dim))
        bits.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(qe, [{ws}]), "
            f"pr -> pr[1] * pr[2])) >= 0 THEN {1 << r} ELSE 0 END)"
        )
    return "CAST((" + " + ".join(bits) + ") AS INT)"


def _banded_cte_duck(bands: int, rows: int, dim: int) -> str:
    """CTE prefix computing qe + band0..band{B-1} bucket columns."""
    band_cols = ", ".join(
        f"{_band_bucket_duck(b, rows, dim)} AS band{b}" for b in range(bands)
    )
    return f"""
    qz AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(floor(x * {QUANT}) AS BIGINT))
                    AS qe
           FROM embeddings),
    bucketed AS (SELECT vec_id, qe, {band_cols} FROM qz)"""


def lsh_topk_oracle_sql(
    k: int = 5,
    n_queries: int = 10,
    dim: int = LSH_DIM,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS_PER_BAND,
) -> str:
    """DuckDB oracle reproducing lsh_topk exactly (same integer band
    buckets, same any-band candidate rule, same quantized scores and
    tie-break)."""
    any_band = " OR ".join(f"a.band{b} = b.band{b}" for b in range(bands))
    return f"""
    WITH {_banded_cte_duck(bands, rows, dim)},
    q AS (SELECT * FROM bucketed WHERE vec_id < {n_queries}),
    cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM q a JOIN bucketed b ON a.vec_id != b.vec_id AND ({any_band})
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(list_zip(qa.qe, qb.qe),
                      p -> p[1] * p[2])) AS qdot
      FROM cand c JOIN qz qa ON qa.vec_id = c.query_id
                  JOIN qz qb ON qb.vec_id = c.neighbor_id
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
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS_PER_BAND,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors sharing an LSH bucket
    in ANY band whose cosine similarity reaches ``threshold_ppm`` (ppm).

    Banded blocking is the scale path: the band equi-join moves only
    (id, band, bucket) triples — vectors never ride through it — and pair
    work per band is ~N^2/2^rows, so ``rows`` scales the bucket space with
    the corpus while ``bands`` buys recall. Candidate id-pairs are
    distinct'ed BEFORE vectors are fetched, so multi-band collisions score
    once. Cross-engine exactness of the score: components quantize to int64
    (floor(x*QUANT)); dot and squared norms are integer; the only float
    steps are one product, one IEEE-correctly-rounded sqrt, one division
    and one floor — all exactly rounded, hence bit-identical on any
    IEEE-754 engine. Zero-norm vectors never pair.

    ``dim`` is bounded at 2048: the int64 norm product qn1*qn2 can reach
    (dim * QUANT^2)^2 and overflows past that bound — where Spark's
    non-ANSI multiply would silently WRAP (garbage cosines) while the
    DuckDB oracle errors. Fail loudly instead.
    """
    if dim > 2048:
        raise ValueError(
            f"embedding_cosine_pairs: dim={dim} exceeds 2048 — the int64 "
            "norm product would overflow (Spark wraps silently; the oracle "
            "errors); reduce QUANT or split the dimensions"
        )
    keys = lsh_band_keys(embeddings, bands, rows, dim, id_col)
    a, b = keys.alias("a"), keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec1"), F.col(f"b.{id_col}").alias("vec2")
        )
        .distinct()
    )
    qz = _quantized(embeddings, id_col, dim).withColumn(
        "qn", F.expr("aggregate(transform(_qe, x -> x * x), 0L, (acc, v) -> acc + v)")
    )
    scored = (
        cand.join(
            qz.select(
                F.col(id_col).alias("vec1"),
                F.col("_qe").alias("_qa"),
                F.col("qn").alias("qn1"),
            ),
            "vec1",
        )
        .join(
            qz.select(
                F.col(id_col).alias("vec2"),
                F.col("_qe").alias("_qb"),
                F.col("qn").alias("qn2"),
            ),
            "vec2",
        )
        .filter((F.col("qn1") > 0) & (F.col("qn2") > 0))
        .select(
            "vec1",
            "vec2",
            F.expr(_QDOT_QE).alias("qdot"),
            (F.col("qn1") * F.col("qn2")).alias("nprod"),
        )
    )
    scored = scored.withColumn(
        "cosine_ppm",
        F.floor(F.col("qdot") * 1000000.0 / F.sqrt(F.col("nprod").cast("double"))).cast(
            "long"
        ),
    )
    return scored.filter(F.col("cosine_ppm") >= threshold_ppm).select(
        "vec1", "vec2", "cosine_ppm"
    )


def embedding_cosine_pairs_oracle_sql(
    threshold_ppm: int = 900_000,
    dim: int = LSH_DIM,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS_PER_BAND,
) -> str:
    any_band = " OR ".join(f"a.band{b} = b.band{b}" for b in range(bands))
    return f"""
    WITH {_banded_cte_duck(bands, rows, dim)},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2
      FROM bucketed a JOIN bucketed b
        ON a.vec_id < b.vec_id AND ({any_band})
    ),
    norms AS (
      SELECT vec_id, qe,
             list_sum(list_transform(qe, x -> x * x)) AS qn
      FROM qz
    ),
    pairs AS (
      SELECT c.vec1, c.vec2,
             list_sum(list_transform(list_zip(na.qe, nb.qe),
                      p -> p[1] * p[2])) AS qdot,
             na.qn * nb.qn AS nprod
      FROM cand c JOIN norms na ON na.vec_id = c.vec1
                  JOIN norms nb ON nb.vec_id = c.vec2
      WHERE na.qn > 0 AND nb.qn > 0
    )
    SELECT vec1, vec2,
           CAST(floor(qdot * 1000000.0 / sqrt(CAST(nprod AS DOUBLE))) AS BIGINT)
             AS cosine_ppm
    FROM pairs
    WHERE floor(qdot * 1000000.0 / sqrt(CAST(nprod AS DOUBLE))) >= {threshold_ppm}
    """


# -------------------------------------------------------------- IVF ANN
IVF_PROBE = 4


def _ivf_assign_expr(cents: list[list[int]], n_out: int) -> str:
    """Expression assigning a vector to its ``n_out`` nearest centroids
    (exact int64 squared-L2 over quantized components), returned as an
    array of centroid ids ordered by (distance, id) — deterministic.
    Uses the let-binding idiom (see lsh_band_keys) so the quantized vector
    and the distance array are computed once per row."""
    k = len(cents)
    dists = (
        "transform(_ivfc, cw -> aggregate(zip_with(qe, cw, "
        "(x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v))"
    )
    ranked = (
        f"transform(array({dists}), ds -> "
        f"transform(slice(array_sort(zip_with(ds, sequence(0, {k - 1}), "
        f"(d, i) -> struct(d as d, i as i))), 1, {n_out}), s -> s.i))[0]"
    )
    return ranked


IVF_TRAIN_SAMPLE = 1024  # driver-side training sample size (bounded collect)
IVF_TRAIN_ITERS = 8  # fixed Lloyd's iterations — determinism over convergence


def scaled_centroid_count(n_rows: int) -> int:
    """K ~ sqrt(N), clamped — the classic IVF sizing: candidate work per
    query is ~ n_probe * N / K, so K ~ sqrt(N) balances inverted-list
    length against probe count as the corpus grows."""
    import math

    return max(4, min(4096, math.isqrt(max(n_rows, 1))))


def train_centroids(
    sample: list[list[int]], k: int, iters: int = IVF_TRAIN_ITERS
) -> list[list[int]]:
    """Deterministic integer Lloyd's k-means over a quantized sample.

    Everything is int64: init picks k evenly-spaced sample vectors (the
    sample arrives sorted by id), assignment is exact squared-L2 with ties
    to the lowest centroid index (argmin contract), and the update is the
    element-wise integer mean (floor division). Empty clusters keep their
    previous centroid. The SAME function runs for the Spark plan and for
    the oracle generator, so both engines receive identical centroid
    literals — cross-engine exactness never touches float arithmetic."""
    import numpy as np

    if not sample:
        return []  # empty corpus: no centroids, no assignments
    X = np.asarray(sample, dtype=np.int64)
    n = len(X)
    k = max(1, min(k, n))
    cents = X[[(i * n) // k for i in range(k)]].copy()
    x2 = (X * X).sum(axis=1)
    for _ in range(iters):
        # exact int64 squared distances via x^2 + c^2 - 2xc (avoids the
        # (n, k, dim) temporary a direct broadcast subtraction would build)
        c2 = (cents * cents).sum(axis=1)
        d = x2[:, None] + c2[None, :] - 2 * (X @ cents.T)
        assign = d.argmin(axis=1)  # ties -> lowest centroid index
        for j in range(k):
            members = X[assign == j]
            if len(members):
                cents[j] = members.sum(axis=0) // len(members)
    return [[int(v) for v in c] for c in cents]


def _ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str,
    dim: int,
    train_sample: int = IVF_TRAIN_SAMPLE,
    train_iters: int = IVF_TRAIN_ITERS,
):
    """Trained centroids from a deterministic sample: the quantized vectors
    of the ``train_sample`` lowest-id rows (SQL-reproducible selection),
    refined by integer k-means. Constant-size driver collect (like the
    dedup top-64 table); at 100 TB raise ``train_sample`` — the collect is
    train_sample x dim int64s regardless of corpus size."""
    # the sample must dominate K: with K >= sample size every sample row
    # becomes its own centroid, Lloyd's iterations are a no-op, and the
    # "trained" index degenerates to the lowest-id selection this function
    # exists to replace. 8 samples per centroid keeps the mean meaningful.
    train_sample = max(train_sample, 8 * n_centroids)
    rows = (
        embeddings.select(F.col(id_col), F.expr(_qe_expr(dim)).alias("qe"))
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    )
    return train_centroids([list(r["qe"]) for r in rows], n_centroids, train_iters)


def ivf_oracle_centroids(
    parquet_path: str,
    n_centroids: int | None = None,
    dim: int = LSH_DIM,
    train_sample: int = IVF_TRAIN_SAMPLE,
    train_iters: int = IVF_TRAIN_ITERS,
) -> list[list[int]]:
    """The oracle generator's copy of the training pass: identical sample
    selection + quantization via DuckDB, then the same train_centroids —
    so the literals embedded in the oracle SQL equal the ones the Spark
    plan broadcasts."""
    import duckdb

    con = duckdb.connect()
    if n_centroids is None:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{parquet_path}')"
        ).fetchone()[0]
        n_centroids = scaled_centroid_count(n)
    # same K-scaled sample rule as _ivf_centroids — the two passes must
    # select identical samples or the centroid literals diverge
    train_sample = max(train_sample, 8 * n_centroids)
    sample = [
        list(r[0])
        for r in con.execute(
            f"SELECT list_transform(embedding, x -> CAST(floor(x * {QUANT}) AS BIGINT))"
            f" FROM read_parquet('{parquet_path}') ORDER BY vec_id LIMIT {train_sample}"
        ).fetchall()
    ]
    return train_centroids(sample, n_centroids, train_iters)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    n_probe: int = IVF_PROBE,
    dim: int = LSH_DIM,
    small_queries: bool = True,
    train_sample: int = IVF_TRAIN_SAMPLE,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """IVF-style ANN top-k: corpus vectors are inverted-listed under their
    nearest TRAINED centroid (deterministic integer k-means over a bounded
    sample); each query probes its ``n_probe`` nearest centroids and
    re-ranks the union of those lists exactly.

    ``n_centroids=None`` scales K with the corpus (~sqrt(N), one count()
    job at build). Scale shape: the build pass is one broadcast of K
    centroid vectors + K distance evaluations per corpus vector (linear,
    no shuffle of vectors beyond the list equi-join); queries shuffle only
    (id, centroid) probe pairs. Candidate fraction ~ n_probe/n_centroids
    of the corpus — K grows with N, n_probe with recall needs. All math is
    quantized-int64, reproduced bit-for-bit by the DuckDB oracle."""
    spark = embeddings.sparkSession
    if n_centroids is None:
        n_centroids = scaled_centroid_count(embeddings.count())
    cents = _ivf_centroids(embeddings, n_centroids, id_col, dim, train_sample, train_iters)
    cdf = F.broadcast(spark.createDataFrame([(cents,)], "_ivfc array<array<bigint>>"))
    assign = (
        f"transform(array({_qe_expr(dim)}), qe -> {_ivf_assign_expr(cents, 1)})[0][0]"
    )
    probes = (
        f"transform(array({_qe_expr(dim)}), qe -> {_ivf_assign_expr(cents, n_probe)})[0]"
    )
    corpus = embeddings.crossJoin(cdf).select(
        F.col(id_col).alias("neighbor_id"), F.expr(assign).alias("centroid")
    )
    qprobe = queries.crossJoin(cdf).select(
        F.col(id_col).alias("query_id"), F.explode(F.expr(probes)).alias("centroid")
    )
    cand = (
        _maybe_broadcast(qprobe, small_queries)
        .join(corpus, "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qa = _maybe_broadcast(
        _quantized(queries, id_col, dim)
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_qe", "_qa"),
        small_queries,
    )
    qb = _quantized(embeddings, id_col, dim).withColumnRenamed(
        id_col, "neighbor_id"
    ).withColumnRenamed("_qe", "_qb")
    scored = (
        cand.join(qa, "query_id")
        .join(qb, "neighbor_id")
        .select("query_id", "neighbor_id", F.expr(_QDOT_QE).alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "qdot")
    )


def ivf_topk_oracle_sql(
    centroids: list[list[int]],
    k: int = 5,
    n_queries: int = 10,
    n_probe: int = IVF_PROBE,
) -> str:
    """DuckDB oracle reproducing ivf_topk exactly: the TRAINED centroids
    are embedded as literals (produced by ivf_oracle_centroids, which runs
    the same deterministic training the Spark plan ran — like the LSH
    plane weights, no arithmetic is re-derived in SQL), same quantization,
    same (distance, id) probe ordering, same scores."""
    cent_rows = ", ".join(
        f"({cid}, {list(qe)}::BIGINT[])" for cid, qe in enumerate(centroids)
    )
    return f"""
    WITH qz AS (SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(floor(x * {QUANT}) AS BIGINT)) AS qe
                FROM embeddings),
    cents AS (SELECT * FROM (VALUES {cent_rows}) AS t(cid, qe)),
    dists AS (
      SELECT v.vec_id, c.cid,
             CAST(list_sum(list_transform(list_zip(v.qe, c.qe),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d
      FROM qz v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, cid AS centroid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS centroid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists WHERE vec_id < {n_queries}
      ) WHERE rn <= {n_probe}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.neighbor_id
      FROM probes p JOIN assigned a ON p.centroid = a.centroid
      WHERE p.query_id != a.neighbor_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(list_zip(qa.qe, qb.qe),
                      p -> p[1] * p[2])) AS qdot
      FROM cand c JOIN qz qa ON qa.vec_id = c.query_id
                  JOIN qz qb ON qb.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(qdot AS BIGINT) AS qdot FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ------------------------------------------------------- semantic dedup
SEMDEDUP_THRESHOLD_PPM = 950_000


def semantic_dedup(
    embeddings: DataFrame,
    threshold_ppm: int = SEMDEDUP_THRESHOLD_PPM,
    id_col: str = "vec_id",
    n_centroids: int | None = None,
    dim: int = LSH_DIM,
    train_sample: int = IVF_TRAIN_SAMPLE,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the corpus with the TRAINED integer k-means (the IVF training
    pass), then within each cluster drop every vector that has a
    smaller-id near-duplicate (exact quantized cosine >= ``threshold_ppm``
    ppm) in the SAME cluster. Returns the survivors as (id, cell).

    The keep rule is the deterministic greedy: a vector is dropped iff ANY
    smaller-id vector in its cell reaches the threshold — one
    representative (the lowest id) survives per near-duplicate
    neighborhood, independent of partitioning and engine.

    Scale shape (the reason this beats all-pairs cosine at 100 TB): the
    only vector movement is one broadcast of K centroid rows; assignment
    is K exact int64 distances per row inside codegen; the pair self-join
    is PER CELL, and K ~ sqrt(N) keeps expected cell size ~ sqrt(N), so
    pair work is ~N^1.5/2 instead of N^2/2 — and unlike banded LSH
    blocking, a vector lands in exactly ONE cell, so no distinct over
    multi-band collisions is needed. Skewed cells (a dense semantic mode)
    are the residual risk: raise ``n_centroids`` (more, smaller cells) —
    the same knob a production SemDeDup run tunes.

    Cross-engine exactness: identical centroid literals feed both engines
    (parity-by-construction, like ivf_topk), and the cosine is the same
    int64-quantized / single-sqrt formula as embedding_cosine_pairs —
    bit-identical on any IEEE-754 engine. The dim <= 2048 overflow guard
    applies for the same reason.
    """
    if dim > 2048:
        raise ValueError(
            f"semantic_dedup: dim={dim} exceeds 2048 — the int64 norm "
            "product would overflow (Spark wraps silently; the oracle "
            "errors); reduce QUANT or split the dimensions"
        )
    spark = embeddings.sparkSession
    if n_centroids is None:
        n_centroids = scaled_centroid_count(embeddings.count())
    cents = _ivf_centroids(
        embeddings, n_centroids, id_col, dim, train_sample, train_iters
    )
    cdf = F.broadcast(spark.createDataFrame([(cents,)], "_ivfc array<array<bigint>>"))
    assign = (
        f"transform(array({_qe_expr(dim)}), qe -> {_ivf_assign_expr(cents, 1)})[0][0]"
    )
    qn = "aggregate(transform(_qe, x -> x * x), 0L, (acc, v) -> acc + v)"
    assigned = (
        embeddings.crossJoin(cdf)
        .select(
            F.col(id_col),
            F.expr(assign).cast("int").alias("cell"),
            F.expr(_qe_expr(dim)).alias("_qe"),
        )
        .withColumn("qn", F.expr(qn))
    )
    a = assigned.select(
        F.col(id_col).alias("id1"), "cell", F.col("_qe").alias("_qa"),
        F.col("qn").alias("qn1"),
    )
    b = assigned.select(
        F.col(id_col).alias("id2"), "cell", F.col("_qe").alias("_qb"),
        F.col("qn").alias("qn2"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(
            (F.col("id1") < F.col("id2")) & (F.col("qn1") > 0) & (F.col("qn2") > 0)
        )
        .select(
            "id2",
            F.expr(_QDOT_QE).alias("qdot"),
            (F.col("qn1") * F.col("qn2")).alias("nprod"),
        )
        .filter(
            F.floor(
                F.col("qdot") * 1000000.0 / F.sqrt(F.col("nprod").cast("double"))
            )
            >= threshold_ppm
        )
        .select(F.col("id2").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(id_col, "cell")


def semantic_dedup_oracle_sql(
    centroids: list[list[int]],
    threshold_ppm: int = SEMDEDUP_THRESHOLD_PPM,
) -> str:
    """DuckDB oracle reproducing semantic_dedup exactly: the trained
    centroid literals arrive from ivf_oracle_centroids (the same training
    the Spark plan ran), assignment is the same (distance, id) argmin,
    the cosine the same quantized formula as the near-dup oracle."""
    cent_rows = ", ".join(
        f"({cid}, {list(qe)}::BIGINT[])" for cid, qe in enumerate(centroids)
    )
    return f"""
    WITH qz AS (SELECT vec_id,
                       list_transform(embedding,
                                      x -> CAST(floor(x * {QUANT}) AS BIGINT)) AS qe
                FROM embeddings),
    cents AS (SELECT * FROM (VALUES {cent_rows}) AS t(cid, qe)),
    dists AS (
      SELECT v.vec_id, c.cid,
             CAST(list_sum(list_transform(list_zip(v.qe, c.qe),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d
      FROM qz v CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    norms AS (
      SELECT a.vec_id, a.cell, z.qe,
             list_sum(list_transform(z.qe, x -> x * x)) AS qn
      FROM assigned a JOIN qz z USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT nb.vec_id
      FROM norms na JOIN norms nb
        ON na.cell = nb.cell AND na.vec_id < nb.vec_id
      WHERE na.qn > 0 AND nb.qn > 0
        AND floor(list_sum(list_transform(list_zip(na.qe, nb.qe),
                  p -> p[1] * p[2])) * 1000000.0
                  / sqrt(CAST(na.qn * nb.qn AS DOUBLE))) >= {threshold_ppm}
    )
    SELECT a.vec_id, CAST(a.cell AS INT) AS cell
    FROM assigned a ANTI JOIN dropped d ON a.vec_id = d.vec_id
    """
