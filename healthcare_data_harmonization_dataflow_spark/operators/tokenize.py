"""Distributed tokenizer-training primitives: the first BPE merge
iteration (Sennrich et al. 2016) computed corpus-wide.

``bpe_pair_counts`` is the inner loop of byte-pair-encoding training — the
adjacent-symbol-pair frequency table — expressed Spark-first:

1. **Word frequencies** (one map-side-combinable groupBy): text is
   normalized (lowercase, punctuation -> space) and whitespace-split; the
   shuffle moves (word, partial_count) rows, never documents. On 100 TB
   the distinct-word table is Zipf-bounded (tens of millions of rows, a
   few GB) — orders of magnitude smaller than the corpus.
2. **Pair expansion over DISTINCT words** (per-row higher-order function,
   zero extra shuffle): each distinct word expands to its length-1
   adjacent character pairs via ``transform(sequence(...))``; pair counts
   are weighted by the word frequency. Expanding distinct words instead
   of the corpus is the standard BPE-training trick — work is
   O(vocabulary), not O(corpus).
3. **Pair totals + deterministic top-K** (one tiny shuffle): the pair
   space is bounded by alphabet^2, so the final aggregate is a few
   thousand rows; the top-K window sort is on that tiny frame, not the
   corpus. Ties break count-desc then pair-asc — the same rule a
   single-node BPE trainer uses to stay reproducible.

A full BPE training run is this pass iterated with the winning pair merged
into the symbol table each round; the per-iteration data movement never
exceeds the (word, count) table, which is the scale-safe property that
matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Shared normalization: lowercase, ASCII punctuation -> space (same 32-char
# class in Java regex and RE2), whitespace split, drop empties.
_WORDS_SPARK = (
    "filter(split(regexp_replace(lower(coalesce({col}, '')), "
    "'\\\\p{{Punct}}', ' '), ' '), w -> w != '')"
)
_WORDS_DUCK = (
    "list_filter(string_split(regexp_replace(lower(coalesce({col}, '')), "
    "'[[:punct:]]', ' ', 'g'), ' '), w -> w != '')"
)


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_k: int = 50
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies (the first BPE merge
    iteration): ``pair`` ("x y"), ``pair_count``, and the deterministic
    ``rank`` (count desc, pair asc). Returns the top ``top_k`` pairs."""
    words = docs.select(
        F.explode(F.expr(_WORDS_SPARK.format(col=text_col))).alias("word")
    )
    wc = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # Spark's sequence(1, 0) is DESCENDING ([1, 0]), not empty like
    # DuckDB's generate_series — single-char words must be excluded
    # explicitly (they contribute no pairs in either engine).
    pairs = wc.filter(F.expr("char_length(word) >= 2")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1), "
                "i -> concat(substring(word, i, 1), ' ', "
                "substring(word, i + 1, 1)))"
            )
        ).alias("pair"),
        "cnt",
    )
    totals = pairs.groupBy("pair").agg(F.sum("cnt").alias("pair_count"))
    # orderBy + limit compiles to TakeOrderedAndProject — a DISTRIBUTED
    # per-partition top-K merged on the driver, not a single-partition
    # global window over every pair. The rank window then runs over only
    # the top_k survivors.
    top = totals.orderBy(
        F.col("pair_count").desc(), F.col("pair").asc()
    ).limit(int(top_k))
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return top.select(
        "pair",
        "pair_count",
        F.row_number().over(w).cast("int").alias("rank"),
    )


def bpe_pair_counts_oracle_sql(
    table: str = "documents", text_col: str = "text", top_k: int = 50
) -> str:
    """DuckDB SQL reproducing bpe_pair_counts exactly (same normalization,
    same weighting, same tie-break)."""
    return f"""
    WITH w AS (
      SELECT unnest({_WORDS_DUCK.format(col=text_col)}) AS word FROM {table}
    ),
    wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY word),
    p AS (
      SELECT concat(substr(word, i, 1), ' ', substr(word, i + 1, 1)) AS pair,
             cnt
      FROM wc
      CROSS JOIN unnest(generate_series(1, length(word) - 1)) AS t(i)
    ),
    pc AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS pair_count
           FROM p GROUP BY pair),
    ranked AS (
      SELECT pair, pair_count,
             CAST(row_number() OVER (ORDER BY pair_count DESC, pair ASC)
                  AS INT) AS rank
      FROM pc
    )
    SELECT pair, pair_count, rank FROM ranked WHERE rank <= {int(top_k)}
    """
