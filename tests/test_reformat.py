"""Reference §2.3 reformat-transform golden-string parity tests.

Goldens come from the reference's unit tests (SURVEY §5):
TableRowToJsonFnTest.java:26-31, CreateMappingFnInputTest.java:26-43,
CreateFhirResourceBundleTest.java:27-44, ExtractWebpathFromPubsubTest.java:30-46,
WebPathParserTest.java:26-46.
"""

import pyspark.sql.functions as F

from healthcare_data_harmonization_dataflow_spark.functions.reformat import (
    create_mapping_fn_input,
    extract_webpath_from_pubsub,
    ndjson_parse_messages,
    parse_dicom_webpath,
    table_row_to_json,
)
from healthcare_data_harmonization_dataflow_spark.operators.bundles import (
    to_transaction_bundle,
)

WEBPATH = (
    "projects/p1/locations/l1/datasets/d1/dicomStores/s1/dicomWeb/"
    "studies/st1/series/se1/instances/i1"
)


def test_table_row_to_json_golden(spark):
    df = spark.createDataFrame([('{"name":"John Doe","age":31}',)], "row string")
    got = df.select(table_row_to_json("Patient", "row").alias("j")).collect()[0]["j"]
    assert got == '{"Patient":{"name":"John Doe","age":31}}'


def test_create_mapping_fn_input_golden(spark):
    df = spark.createDataFrame([('[{"tag1":"v1"},{"tag2":"v2"}]',)], "meta string")
    got = df.select(create_mapping_fn_input("meta").alias("j")).collect()[0]["j"]
    assert got == '{"study":[{"tag1":"v1"},{"tag2":"v2"}]}'


def test_transaction_bundle_golden(spark):
    # CreateFhirResourceBundle golden shape (DicomToFhirStreamingRunner.java:166-191)
    df = spark.createDataFrame([("1", '{"resourceType":"ImagingStudy","id":"x"}')], "id string, res string")
    got = to_transaction_bundle(df, "res", url="ImagingStudy").collect()[0]["bundle"]
    assert got == (
        '{"resourceType":"Bundle","type":"transaction","entry":'
        '[{"resource":{"resourceType":"ImagingStudy","id":"x"},'
        '"request":{"method":"POST","url":"ImagingStudy"}}]}'
    )


def test_extract_webpath_from_pubsub(spark):
    df = spark.createDataFrame([(bytearray(WEBPATH, "utf-8"),)], "payload binary")
    got = df.select(extract_webpath_from_pubsub("payload").alias("w")).collect()[0]["w"]
    assert got == WEBPATH


def test_parse_dicom_webpath_fields(spark):
    df = spark.createDataFrame([(WEBPATH,)], "w string")
    r = df.select(parse_dicom_webpath("w").alias("p")).select("p.*").collect()[0]
    assert (r["project"], r["location"], r["dataset"], r["storeId"]) == ("p1", "l1", "d1", "s1")
    assert (r["studyId"], r["seriesId"], r["instanceId"]) == ("st1", "se1", "i1")


def test_parse_dicom_webpath_malformed(spark):
    df = spark.createDataFrame([("projects/p1/locations",)], "w string")
    r = df.select(parse_dicom_webpath("w").alias("p")).select("p.*").collect()[0]
    assert r["project"] == "p1" and r["dataset"] is None  # null -> dead-letter upstream


def test_ndjson_parse_split(spark):
    df = spark.createDataFrame([('{"a":1}',), ("notjson",), (None,)], "value string")
    rows = ndjson_parse_messages(df).collect()
    valid = [r for r in rows if r["err"] is None]
    invalid = [r for r in rows if r["err"] is not None]
    assert len(valid) == 1 and len(invalid) == 2  # invalid/valid counters' split
