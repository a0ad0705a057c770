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


def test_export_and_read_full_lifecycle(spark, tmp_path):
    """HL7v2IO.Export lifecycle parity (HL7v2IO.java:495-678): schedule ->
    500ms-style poll loop -> NDJSON read with valid/invalid split ->
    temp-file cleanup AFTER both branches are pinned (the Wait.on
    analogue). Service calls are injected; a failed operation raises."""
    import os

    import pytest

    from healthcare_data_harmonization_dataflow_spark.functions.reformat import (
        export_and_read,
    )

    exp = str(tmp_path / "export")
    polls = []

    def schedule(path):
        # the "service" lands NDJSON files at the export prefix
        os.makedirs(path)
        with open(os.path.join(path, "shard-0.ndjson"), "w") as f:
            f.write('{"msg":"a"}\n{"msg":"b"}\nnot json\n')
        with open(os.path.join(path, "shard-1.ndjson"), "w") as f:
            f.write('{"msg":"c"}\n')
        return {"name": "op-1", "done": False}

    def poll(op):
        polls.append(op["name"])
        return {**op, "done": len(polls) >= 2}  # completes on 2nd poll

    messages, errors = export_and_read(
        spark, exp, schedule, poll, poll_interval_s=0.01
    )
    assert polls == ["op-1", "op-1"]  # polled until done
    assert messages.count() == 3
    assert errors.count() == 1
    assert errors.first()["err"].startswith("invalid message: ")
    # cleanup ran, and the returned frames SURVIVE it (Wait.on barrier)
    assert not os.path.exists(exp)
    assert messages.count() == 3

    # a completed-with-error operation raises, like ExportMessagesFn
    def schedule_bad(path):
        return {"name": "op-2", "done": True, "error": "boom"}

    with pytest.raises(RuntimeError, match="op-2.*boom"):
        export_and_read(spark, exp, schedule_bad, poll)

    # cleanup=False keeps the files and the lazy plan
    exp2 = str(tmp_path / "export2")
    m2, e2 = export_and_read(
        spark, exp2,
        lambda p: (schedule(p), {"name": "op-3", "done": True})[1],
        poll, cleanup=False,
    )
    assert os.path.exists(exp2)
    assert m2.count() == 3 and e2.count() == 1
