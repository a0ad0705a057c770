"""QueryOptions sources + the Custom→FHIR pipeline — the reference's third
runner.

``QueryOptions`` (QueryOptions.java:27-44) maps table names to SQL query
strings; the custom pipeline (README.md:166-243 of the reference) runs each
query against BigQuery, wraps every row as ``{"<tableName>": {..row..}}``
(TableRowToJsonFn.java:24-42), pushes it through MappingFn and writes the
mapped bundles via FhirIO. Here the queries run as ``spark.sql`` (any
registered table/catalog — Iceberg, parquet views, JDBC), and the rest of
the flow reuses the engine's mapping + bundle + error machinery verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.reformat import table_row_to_json
from ..operators.bundles import to_transaction_bundle
from ..operators.mapping_op import apply_mapping


def validate_query_options(query_options: dict[str, str]) -> dict[str, str]:
    """Fail-fast shape check (QueryOptions.java:31-41: names and queries
    must be non-empty)."""
    if not query_options:
        raise ValueError("query_options must name at least one table query")
    for name, sql in query_options.items():
        if not name or not str(sql).strip():
            raise ValueError(f"query_options entry {name!r} has an empty query")
    return query_options


def read_query_sources(
    spark: SparkSession, query_options: dict[str, str]
) -> dict[str, DataFrame]:
    """One DataFrame per named query — the BigQuery read analogue."""
    return {
        name: spark.sql(sql)
        for name, sql in validate_query_options(query_options).items()
    }


def rows_as_table_json(df: DataFrame, table_name: str) -> DataFrame:
    """Rows -> ``{"<tableName>": {..row..}}`` strings (TableRowToJsonFn).
    The row renders through ``to_json(struct(*))`` — insertion order =
    query column order, matching the reference's TableRow iteration."""
    return df.select(
        F.lit(table_name).alias("source_table"),
        table_row_to_json(table_name, F.to_json(F.struct(*df.columns))).alias("data"),
    )


def custom_to_fhir(
    spark: SparkSession,
    query_options: dict[str, str],
    mapping_config: str,
    bundle_url: str = "Bundle",
) -> DataFrame:
    """The bounded Custom→FHIR pipeline: named queries -> TableRow-JSON ->
    mapping (union-typed ok/err) -> transaction bundles. Returns one
    DataFrame with (source_table, data, ok, err, bundle); callers split
    with ok_rows/err_rows and route to sinks."""
    sources = read_query_sources(spark, query_options)
    union = None
    for name, df in sources.items():
        part = rows_as_table_json(df, name).withColumn(
            "id", F.concat(F.lit(name + ":"), F.monotonically_increasing_id())
        )
        union = part if union is None else union.unionByName(part)
    mapped = apply_mapping(union, mapping_config, id_col="id", data_col="data")
    return to_transaction_bundle(mapped, "ok", url=bundle_url)
