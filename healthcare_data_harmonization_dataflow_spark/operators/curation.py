"""Corpus-curation operators for training-data pipelines: PII scrubbing
and benchmark-contamination flagging.

Both are scale-first designs:

* ``scrub_pii`` is a pure chain of JVM-side ``regexp_replace`` /
  ``regexp_extract_all`` expressions (no Python, whole-stage codegen), so a
  100 TB corpus pass is a single pruned scan. The patterns live in module
  constants shared verbatim with the DuckDB oracle generators — Java regex
  and RE2 agree on this subset (character classes, bounded repetition,
  ``\\b`` with ASCII word chars; no backrefs or lookaround).

* ``contamination_flags`` joins the corpus against a SMALL blocklist of
  benchmark snippets via ``broadcast`` + ``contains`` (a nested-loop
  substring scan per document — embarrassingly parallel, the corpus never
  shuffles for the probe; only the (doc_id, hit) pairs shuffle for the
  count). This mirrors the decontamination pass an LLM data pipeline runs
  against eval-set n-grams: the blocklist is bounded (benchmarks are
  finite), the corpus is not.

The reference pipeline has no curation stage; these extend its
harmonization surface to the training-data operations the engine is
deployed for (per the project brief), alongside the dedup family in
operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java/RE2-compatible PII patterns (both dialects: no lookaround, no
# backrefs, ASCII \b). Replacement order matters: emails first (their local
# part may contain digit runs), then SSNs (the more specific dashed-digit
# shape), then phones. PHONE_RE handles the parenthesized area-code form as
# an explicit alternative — `\b\(?` would make the paren unmatchable dead
# syntax (\b cannot hold between two non-word chars) and leave a stray '('
# after redaction.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"(?:\(\d{3}\)|\b\d{3})[ -]\d{3}-\d{4}\b"

_KINDS = (("email", EMAIL_RE), ("ssn", SSN_RE), ("phone", PHONE_RE))

# Decontamination text normalization (GPT-3 appendix C / PaLM style):
# lowercase + strip ASCII punctuation before n-gramming, so a
# capitalization or punctuation variant of a benchmark sentence still
# collides. Java's \p{Punct} and RE2's [[:punct:]] are the same 32 ASCII
# chars, so the Spark expression and the DuckDB oracle agree byte-for-byte.
NGRAM_NORM_SPARK_RE = r"\p{Punct}"
NGRAM_NORM_DUCK = (
    "list_filter(string_split(regexp_replace(lower(coalesce(text, '')), "
    "'[[:punct:]]', ' ', 'g'), ' '), w -> w != '')"
)


def _txt(text_col: str) -> Column:
    """NULL-safe text: curation operators treat NULL text as '' so counts
    are 0 and documents are never silently dropped (explode of NULL emits
    no rows; sizeOfNull is -1 under legacy config)."""
    return F.coalesce(F.col(text_col), F.lit(""))


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / SSNs / phone numbers from ``text_col`` and count each
    kind. Adds ``clean_text`` plus ``n_<kind>`` long columns; everything is
    a Catalyst regexp expression (zero Python).

    Counts are SEQUENTIAL like the redaction: each kind is counted on the
    text with the earlier kinds already replaced, so ``n_<kind>`` equals
    exactly the number of ``<KIND>`` tokens emitted (a phone-shaped digit
    run inside an email address counts as the email it was redacted as,
    never as a phantom phone)."""
    stage: Column = _txt(text_col)
    out = docs
    for kind, pat in _KINDS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(stage, F.lit(pat), F.lit(0))).cast(
                "long"
            ),
        )
        stage = F.regexp_replace(stage, F.lit(pat), F.lit(f"<{kind.upper()}>"))
    return out.withColumn("clean_text", stage)


def pii_oracle_exprs(text_expr: str = "text") -> dict[str, str]:
    """DuckDB expressions computing the same counts/redaction (RE2; the 'g'
    flag makes regexp_replace global like Spark's). Mirrors scrub_pii's
    sequential count-then-replace staging exactly."""
    out = {}
    stage = text_expr
    stage = f"coalesce({stage}, '')"  # NULL-safe, mirroring scrub_pii
    for kind, pat in _KINDS:
        out[f"n_{kind}"] = (
            f"CAST(len(regexp_extract_all({stage}, '{pat}')) AS BIGINT)"
        )
        stage = f"regexp_replace({stage}, '{pat}', '<{kind.upper()}>', 'g')"
    out["clean_text"] = stage
    return out


def contamination_flags(
    docs: DataFrame, snippets: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flag documents containing any blocklist snippet (exact substring).

    ``snippets`` must be SMALL (a benchmark/eval blocklist): it is
    broadcast, and each (document, snippet) pair costs one substring scan
    inside the join's nested loop — the corpus side never shuffles for the
    probe. Returns (doc_id, n_hits, contaminated); only the 16-byte
    (doc_id, hit) pairs shuffle for the per-document count. The blocklist
    is deduplicated here (repeated snippet rows would fan out the join and
    inflate counts) and empty snippets are dropped (contains('') is true
    for every document).
    """
    snip = (
        snippets.select(F.col("snip"))
        .where(F.length("snip") > 0)
        .distinct()
    )
    joined = docs.select("doc_id", _txt(text_col).alias("__t")).join(
        F.broadcast(snip), F.col("__t").contains(F.col("snip")), "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("snip").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hits")
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def stratified_sample(
    docs: DataFrame,
    rates: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling by hash thresholding.

    ``rates`` is a SMALL (stratum, keep_permille) table — broadcast, so the
    corpus never shuffles: each row computes a 52-bit md5 prefix of its id,
    keeps it iff ``hash % 1000 < keep_permille`` for its stratum. Unlike
    ``df.sampleBy`` (per-partition RNG: resample on retry/re-read, not
    reproducible across engines), the hash gate is a pure function of the
    row id — idempotent under task retries, stable across runs, and exactly
    reproducible by any engine with md5 (the DuckDB oracle). This is the
    standard language/quality-rebalancing pass of a training-data pipeline.
    Strata absent from ``rates`` are DROPPED (permille 0).
    """
    gate = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
        ).cast("long")
        % 1000
    )
    # hygiene: only the two relevant columns join in (extra rates columns
    # must not leak into the corpus), and duplicate stratum rows would
    # duplicate corpus rows via join fan-out
    r = rates.select(stratum_col, "keep_permille").dropDuplicates(
        [stratum_col]
    )
    return (
        docs.join(F.broadcast(r), on=stratum_col, how="inner")
        .where(gate < F.col("keep_permille"))
        .drop("keep_permille")
    )


def stratified_sample_oracle_sql(
    rates: "list[tuple[str, int]]",
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL reproducing stratified_sample exactly (same md5-prefix
    gate), with the rates inlined as a VALUES list (values SQL-escaped)."""
    vals = ", ".join(
        "('{}', {})".format(str(s).replace("'", "''"), int(p))
        for s, p in rates
    )
    return f"""
        WITH rates({stratum_col}, keep_permille) AS (VALUES {vals})
        SELECT d.* FROM documents d
        JOIN rates r USING ({stratum_col})
        WHERE CAST(concat('0x', substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 13)) AS BIGINT) % 1000
              < r.keep_permille
    """


def dedup_lines(
    docs: DataFrame, min_docs: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-level boilerplate removal: drop every line that appears in at
    least ``min_docs`` DISTINCT documents (the C4/RefinedWeb frequent-line
    pass — navigation chrome, cookie banners, footers).

    Scale shape (100 TB honest): lines explode WITH their position; the
    frequency count moves only (16-byte md5, doc_id) pairs — never text;
    the verdict is a hash join (text crosses the wire here) and reassembly
    is ONE aggregation computing clean_text and the removal count together
    (sort_array over (pos, line, boiler) structs, boilerplate filtered
    in-array) — so text crosses the wire exactly twice (verdict join +
    reassembly reducer), the floor for a global-frequency rewrite. Returns
    (doc_id, clean_text, n_lines_removed).
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(_txt(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    freq = (
        lines.groupBy("lh")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("lh", F.lit(True).alias("boiler"))
    )
    marked = lines.join(freq, "lh", "left")
    # ONE aggregation computes both outputs (separate kept/removed
    # aggregates could not share the exchange, so the explode+join pipeline
    # would execute twice and a third doc_id join-shuffle would merge them):
    # collect (pos, line, boiler) structs, sort by pos, drop boilerplate
    # in-array. A doc whose every line was boilerplate naturally yields an
    # empty clean_text (filter -> empty array -> concat_ws -> "").
    return marked.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.filter(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "line", "boiler"))
                    ),
                    lambda s: s["boiler"].isNull(),
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.sum(F.when(F.col("boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_removed"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    training-prep pass before packing/tokenization. Tokens are SPACE-
    separated words (the corpus-wide convention shared with the dedup and
    text operators — normalize newlines/tabs upstream if the corpus uses
    them); windows start every ``chunk_tokens - overlap`` tokens; the last
    window may be short; an empty document yields one empty chunk. The
    stride is uniform by design: a trailing window whose start falls inside
    the previous window's coverage is still emitted (it is a suffix of the
    previous chunk), keeping chunk_idx = start // stride exact for random
    access; drop `chunk_idx = last` downstream if suffix tails are unwanted.

    Entirely per-row higher-order functions (split / sequence / transform /
    slice) followed by one posexplode: NO shuffle at any size — chunking a
    100 TB corpus is a single embarrassingly-parallel scan. Returns
    (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(_txt(text_col), " "), lambda w: w != "")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s + 1, F.lit(chunk_tokens))).alias(
                "chunk_text"
            ),
            F.least(
                F.lit(chunk_tokens), F.greatest(F.size(toks) - s, F.lit(0))
            )
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


def pack_sequences(
    chunks: DataFrame, seq_len: int = 512, group_size: int = 1024
) -> DataFrame:
    """Assign chunks to fixed-token training sequences by running offset —
    the packing pass between chunking and tokenization. A single global
    order would serialize the corpus through one window partition, so
    packing happens WITHIN groups of ``group_size`` doc_ids: each group's
    chunks are ordered (doc_id, chunk_idx) and their running token offset
    assigns ``seq_id = offset // seq_len`` (a chunk belongs to the
    sequence where it starts and may straddle into the next — standard
    packing-with-attention-mask semantics). One shuffle (the window
    partition by group), embarrassingly parallel across groups. Returns
    (grp, seq_id, doc_id, chunk_idx, n_tokens, seq_offset).
    """
    from pyspark.sql import Window

    id_type = dict(chunks.dtypes).get("doc_id", "")
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        # a string/UUID id would cast to NULL in the division, silently
        # collapsing the whole corpus into ONE window partition — the exact
        # serialization grouping exists to avoid; fail loudly instead
        raise ValueError(
            f"pack_sequences needs an integral doc_id (got {id_type!r}); "
            "derive one first, e.g. xxhash64(doc_id)"
        )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("cum") - F.col("n_tokens")  # token offset where it begins
    return (
        chunks.withColumn(
            "grp", F.floor(F.col("doc_id") / F.lit(group_size)).cast("long")
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "grp",
            F.floor(start / F.lit(seq_len)).cast("long").alias("seq_id"),
            "doc_id",
            "chunk_idx",
            "n_tokens",
            (start % F.lit(seq_len)).cast("long").alias("seq_offset"),
        )
    )


def ngram_hashes(
    docs: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Per-document DISTINCT hashes of word n-grams (md5 of the
    space-joined window). Text is NORMALIZED first — lowercase + ASCII
    punctuation stripped to spaces (the GPT-3/PaLM eval-overlap method) —
    so a case or punctuation variant of a benchmark sentence still
    collides with the blocklist. Returns (doc_id, gram) — 16-byte hashes
    only, never text."""
    norm = F.regexp_replace(
        F.lower(_txt(text_col)), NGRAM_NORM_SPARK_RE, " "
    )
    toks = F.filter(F.split(norm, " "), lambda w: w != "")
    # sequence(1, ub) DESCENDS when ub < 1 (Spark default step -1), so a
    # short document must yield an empty window list, not [1, 0]
    ub = F.size(toks) - (n - 1)
    starts = F.when(ub >= 1, F.sequence(F.lit(1), ub)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        starts,
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, F.lit(n)))),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame, blocklist: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """GPT-3/PaLM-style eval decontamination: count how many distinct
    n-gram hashes of each document collide with a benchmark blocklist.

    ``blocklist`` is a (gram) table of the eval sets' n-gram hashes —
    SMALL relative to the corpus, so it is broadcast and the corpus's
    grams are semi-probed without shuffling text or grams; only the
    (doc_id, matched-gram) pairs reach the per-document count. Returns
    (doc_id, n_gram_hits, contaminated) for EVERY document (0/false when
    clean).
    """
    hits = (
        ngram_hashes(docs, n=n, text_col=text_col)
        # dedupe here, not at call sites: repeated blocklist grams (two eval
        # docs sharing a 13-gram) would fan out the join and inflate counts
        .join(F.broadcast(blocklist.select("gram").distinct()), "gram", "inner")
        .groupBy("doc_id")
        .agg(F.count("gram").cast("long").alias("n_gram_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_gram_hits", F.lit(0)).cast("long").alias("n_gram_hits"),
            (F.coalesce("n_gram_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
