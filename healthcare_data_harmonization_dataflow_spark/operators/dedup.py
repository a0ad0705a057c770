"""Deduplication operators for training-data pipelines.

Not in the reference (its dedup semantics are "each input creates a new
resource", README.md:156) — these are the first-class training-data ops the
north-star adds: exact, MinHash+LSH, SimHash, and n-gram Jaccard dedup over
a ``documents(doc_id, text, ...)`` table.

Scale design notes (the part that matters at 100 TB):

* **Signatures are computed per-row with higher-order functions** —
  ``transform``/``filter``/``array_min`` over the token array — NOT by
  exploding tokens into a shuffle. A 100 TB corpus never shuffles tokens;
  only fixed-width signatures (8x8B minhash, 8B simhash) move.
* **Candidate generation is band-bucket equi-join**: docs sharing an LSH
  band/simhash chunk land in the same shuffle bucket; the join key is the
  band hash, so Catalyst uses a plain shuffled hash join with AQE skew
  splitting. No O(n^2) anywhere except inside a bucket.
* **SimHash banding is exact, not approximate**: splitting a 32-bit
  signature into 4 chunks guarantees (pigeonhole) every pair at Hamming
  distance <= 3 shares a chunk, so candidates + exact bit_count filter ==
  brute force. The DuckDB oracles verify this.

Cross-engine determinism: token hash = first 15 hex digits of md5 as int64
(identical in Spark ``conv(substr(md5(w),1,15),16,10)`` and DuckDB
``CAST('0x'||substr(md5(w),1,15) AS BIGINT)``), so every signature matches
the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# MinHash parameters (shared with the oracle SQL generators)
MINHASH_P = 2147483647  # 2^31 - 1, Mersenne prime
MINHASH_K = 8
MINHASH_BANDS = 4  # bands of 2 rows each
_RNG_A = [1103515245, 1299709, 15485863, 32452843, 49979687, 67867967, 86028121, 104395301]
_RNG_B = [12345, 67891, 24680, 13579, 11111, 22222, 33333, 44444]

SIMHASH_BITS = 32
SIMHASH_HAM = 3  # pairs within this Hamming distance are near-dups
SIMHASH_CHUNKS = SIMHASH_HAM + 1  # pigeonhole: exact candidate generation


def _spark_wordhash(w: str = "w") -> str:
    return f"cast(conv(substring(md5({w}),1,15),16,10) as bigint)"


def _duck_wordhash(w: str = "w") -> str:
    return f"CAST(concat('0x', substr(md5({w}),1,15)) AS BIGINT)"


_SPARK_WORDS = "array_distinct(filter(split(lower(text), ' '), w -> w != ''))"
_DUCK_WORDS = "list_distinct(list_filter(string_split(lower(text), ' '), w -> w != ''))"


# ------------------------------------------------------------------ exact
def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one shuffle on the text hash (group on md5, not the full
    text, so the exchange carries 16B keys instead of document bodies),
    keeping the smallest id as the canonical representative."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("_h"), F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).cast("long").alias("n_dups"))
        .select("keep_id", "n_dups")
    )


def exact_dedup_oracle_sql() -> str:
    return """
    SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
    FROM documents GROUP BY md5(text)
    """


# ------------------------------------------------------------------ minhash
def minhash_signature(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature, computed per-row (no token shuffle).

    Token hashes (md5 -> int64) are materialized ONCE into an array column;
    the K permutations are then cheap integer transforms over it — K times
    less hashing than recomputing md5 per hash function."""
    wh = _spark_wordhash("w")
    with_hashes = docs.select(
        F.col(id_col),
        F.expr(f"transform({_SPARK_WORDS}, w -> {wh} % {MINHASH_P})").alias("_hs"),
    )
    cols = [F.col(id_col)]
    for i in range(MINHASH_K):
        a, b = _RNG_A[i], _RNG_B[i]
        cols.append(
            F.expr(f"array_min(transform(_hs, h -> ({a}L * h + {b}L) % {MINHASH_P}))").alias(
                f"mh{i}"
            )
        )
    return with_hashes.select(*cols)


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.

    Bands explode to (band_idx, band_values...) keys — MINHASH_BANDS rows per
    doc, fixed width — then a self-equi-join on the band key. Only signatures
    shuffle, never text. (In production the band key would be hashed to one
    64-bit bucket id; kept as raw values here so the DuckDB oracle can
    reproduce the join exactly.)
    """
    sig = minhash_signature(docs, id_col=id_col)
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        *[
                            F.col(f"mh{b * rows_per_band + r}").alias(f"v{r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("band", "vals"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.vals") == F.col("b.vals"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2"))
        .distinct()
    )


def minhash_lsh_pairs_oracle_sql() -> str:
    rows_per_band = MINHASH_K // MINHASH_BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {vals} FROM sig".format(
            b=b,
            vals=", ".join(
                f"mh{b * rows_per_band + r} AS v{r}" for r in range(rows_per_band)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    val_eq = " AND ".join(f"a.v{r} = b.v{r}" for r in range(rows_per_band))
    return f"""
    WITH sig AS ({minhash_signature_oracle_sql()}),
    bands AS ({band_rows})
    SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
    FROM bands a JOIN bands b
      ON a.band = b.band AND {val_eq} AND a.doc_id < b.doc_id
    """


def minhash_signature_oracle_sql() -> str:
    wh = _duck_wordhash("w")
    terms = ",\n      ".join(
        f"list_min(list_transform({_DUCK_WORDS}, "
        f"w -> ({_RNG_A[i]} * ({wh} % {MINHASH_P}) + {_RNG_B[i]}) % {MINHASH_P})) AS mh{i}"
        for i in range(MINHASH_K)
    )
    return f"SELECT doc_id,\n      {terms}\nFROM documents"


# ------------------------------------------------------------------ simhash
def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc 32-bit SimHash, per-row (no shuffle). Bit j is set when more
    than half the distinct tokens have bit j set in their hash."""
    wh = _spark_wordhash("w")
    bit_terms = " + ".join(
        f"(case when 2 * size(filter(_hs, h -> (h >> {j}) & 1 = 1)) > size(_hs) "
        f"then cast({1 << j} as bigint) else 0L end)"
        for j in range(SIMHASH_BITS)
    )
    with_hashes = docs.select(
        F.col(id_col), F.expr(f"transform({_SPARK_WORDS}, w -> {wh})").alias("_hs")
    )
    return with_hashes.select(
        F.col(id_col),
        F.expr(f"case when size(_hs) = 0 then 0L else ({bit_terms}) end").alias("simhash"),
    )


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs at Hamming distance <= SIMHASH_HAM. Exact at scale:
    chunk-sharing candidates (pigeonhole-complete) + bit_count verification.
    """
    sig = simhash(docs, id_col=id_col)
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = sig.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(
                        F.lit((1 << chunk_bits) - 1)
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = a.join(
        b,
        (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("doc1"),
        F.col(f"b.{id_col}").alias("doc2"),
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
    )
    return cand.filter(F.col("hamming") <= SIMHASH_HAM).distinct()


def simhash_oracle_sql() -> str:
    wh = _duck_wordhash("w")
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(_hs, h -> (h >> {j}) & 1 = 1)) > len(_hs) "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
    SELECT doc_id,
           CASE WHEN len(_hs) = 0 THEN 0 ELSE ({bit_terms}) END AS simhash
    FROM (SELECT doc_id, list_transform({_DUCK_WORDS}, w -> {wh}) AS _hs FROM documents)
    """


def simhash_pairs_oracle_sql() -> str:
    """Brute-force oracle — verifies the banding is exact, not approximate."""
    return f"""
    WITH s AS ({simhash_oracle_sql()})
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_HAM}
    """


# ------------------------------------------------------------ n-gram jaccard
def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard-similar pairs over distinct-token sets, with prefix
    filtering (PPJoin-style, exact):

    A pair at Jaccard >= t must share a token among each doc's first
    ``floor((1-t)*|d|) + 1`` tokens when tokens are globally ordered by
    ascending document frequency. So only those prefix tokens enter the
    inverted-index self-join — rare tokens first, which is what collapses
    the candidate count on skewed corpora — and candidates are verified
    exactly with one array_intersect per DISTINCT pair (no per-token
    multiplicity ever reaches a groupBy).
    """
    wordsets = docs.select(F.col(id_col), F.expr(_SPARK_WORDS).alias("ws"))
    toks = wordsets.select(id_col, F.size("ws").alias("sz"), F.explode("ws").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "tok")
    prefix = (
        toks.join(dfreq, "tok")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.floor((1 - threshold) * F.col("sz")) + 1)
        .select(id_col, "tok")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2"))
        .distinct()
    )
    ws1 = wordsets.select(F.col(id_col).alias("doc1"), F.col("ws").alias("ws1"))
    ws2 = wordsets.select(F.col(id_col).alias("doc2"), F.col("ws").alias("ws2"))
    # fixed-point ppm: one IEEE-754 division + floor is bit-identical across
    # engines (unlike round-to-decimals, whose algorithms differ)
    verified = (
        cand.join(ws1, "doc1")
        .join(ws2, "doc2")
        .withColumn(
            "jaccard_ppm",
            F.floor(
                F.size(F.array_intersect("ws1", "ws2"))
                * 1000000.0
                / F.size(F.array_union("ws1", "ws2"))
            ).cast("long"),
        )
    )
    threshold_ppm = int(threshold * 1_000_000)
    return verified.filter(F.col("jaccard_ppm") >= threshold_ppm).select(
        "doc1", "doc2", "jaccard_ppm"
    )


def ngram_jaccard_oracle_sql(threshold: float = 0.5) -> str:
    threshold_ppm = int(threshold * 1_000_000)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_WORDS}) AS tok FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS common
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc1, doc2,
           CAST(floor(common * 1000000.0 / (s1.sz + s2.sz - common)) AS BIGINT) AS jaccard_ppm
    FROM common
    JOIN sizes s1 ON s1.doc_id = doc1
    JOIN sizes s2 ON s2.doc_id = doc2
    WHERE floor(common * 1000000.0 / (s1.sz + s2.sz - common)) >= {threshold_ppm}
    """
