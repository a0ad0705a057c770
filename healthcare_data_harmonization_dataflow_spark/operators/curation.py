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
# shape), then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\(?\d{3}\)?[ -]\d{3}-\d{4}\b"

_KINDS = (("email", EMAIL_RE), ("ssn", SSN_RE), ("phone", PHONE_RE))


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / SSNs / phone numbers from ``text_col`` and count each
    kind. Adds ``clean_text`` plus ``n_<kind>`` long columns; everything is
    a Catalyst regexp expression (zero Python)."""
    t = F.col(text_col)
    out = docs
    for kind, pat in _KINDS:
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long"),
        )
    clean: Column = t
    for kind, pat in _KINDS:
        clean = F.regexp_replace(clean, F.lit(pat), F.lit(f"<{kind.upper()}>"))
    return out.withColumn("clean_text", clean)


def pii_oracle_exprs(text_expr: str = "text") -> dict[str, str]:
    """DuckDB expressions computing the same counts/redaction (RE2; the 'g'
    flag makes regexp_replace global like Spark's)."""
    out = {
        f"n_{kind}": (
            f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
        )
        for kind, pat in _KINDS
    }
    clean = text_expr
    for kind, pat in _KINDS:
        clean = f"regexp_replace({clean}, '{pat}', '<{kind.upper()}>', 'g')"
    out["clean_text"] = clean
    return out


def contamination_flags(
    docs: DataFrame, snippets: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flag documents containing any blocklist snippet (exact substring).

    ``snippets`` must be SMALL (a benchmark/eval blocklist): it is
    broadcast, and each (document, snippet) pair costs one substring scan
    inside the join's nested loop — the corpus side never shuffles for the
    probe. Returns (doc_id, n_hits, contaminated); only the 16-byte
    (doc_id, hit) pairs shuffle for the per-document count.
    """
    snip = snippets.select(F.col("snip"))
    joined = docs.select("doc_id", F.col(text_col).alias("__t")).join(
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
