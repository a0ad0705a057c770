"""Bucketed-table layout: the co-located-join storage path for 100 TB.

The reference reads messages one RPC at a time (HL7v2IO.getAll) and never
joins at rest; the north-star engine joins constantly — transcripts to
tool-calls, documents to dedup indexes, embeddings to cells. At 10^12
turns every one of those joins is a full shuffle of the fact table UNLESS
the tables agree on a physical layout up front. Spark's answer is
bucketing (`DataFrameWriter.bucketBy`): rows are hash-partitioned into a
fixed bucket count ON WRITE, the layout is recorded in the catalog, and
Catalyst then plans equi-joins and aggregations on the bucket key with
NO Exchange on the bucketed side(s) — the join cost becomes a per-bucket
sort-merge (or zipper, if also sortBy'd) that scales linearly and never
re-materializes the table on the network.

Rules of thumb encoded here (and pinned by tests/test_operators.py
plan assertions):

* Both sides bucketed on the SAME columns with the SAME bucket count ->
  zero Exchange on either side.
* One side bucketed -> the small side alone shuffles to the bucket
  layout; the 100 TB side stays put.
* ``groupBy(bucket_cols)`` on a bucketed table -> partial+final agg with
  no Exchange at all.
* Bucket count is a cluster-shape decision (total cores × small
  multiple, fixed for the table's lifetime); at local[32] tests use 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: "list[str]",
    sort_cols: "list[str] | None" = None,
    path: "str | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table registered in the session catalog. ``sort_cols`` buys
    merge-join without a per-task sort AND record-level locality for
    range predicates on the sort key."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        int(num_buckets), *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only reaches the planner through the
    catalog; ``spark.read.parquet(path)`` on the same files would plan
    shuffles as if the layout were random."""
    return spark.table(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: "list[str]",
    how: str = "inner",
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key. With both
    sides bucketed identically this plans with zero Exchange; the test
    suite asserts that on the executed plan."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
