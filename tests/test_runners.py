"""EP2 (DICOM→FHIR) and custom (QueryOptions→FHIR) runner parity tests.

Mirrors DicomToFhirStreamingRunner.java:320-335's three stages end-to-end
(read + error branch, mapping + error branch, bundle + error branch, all
committed under one batchId) and the custom runner's
query->TableRow-JSON->mapping->bundle flow (reference README.md:166-243).
"""

import os

import pytest
from pyspark.sql import functions as F

from healthcare_data_harmonization_dataflow_spark.model.errors import err_rows, ok_rows
from healthcare_data_harmonization_dataflow_spark.sources.query_options import (
    custom_to_fhir,
    validate_query_options,
)
from healthcare_data_harmonization_dataflow_spark.streaming.dicom_pipeline import (
    DicomHarmonizationPipeline,
)

# DICOM mapping: study array in, identity-ish projection out
DICOM_CFG = 'out Output: D(root);\ndef D(input) { study: input.study[0].id; }'

WEBPATH_OK = (
    "projects/p/locations/l/datasets/d/dicomStores/s/dicomWeb/studies/st1"
)
WEBPATH_MISSING = (
    "projects/p/locations/l/datasets/d/dicomStores/s/dicomWeb/studies/st404"
)
WEBPATH_BADMETA = (
    "projects/p/locations/l/datasets/d/dicomStores/s/dicomWeb/studies/stbad"
)


def _inputs(spark, tmp_path):
    inp = os.path.join(str(tmp_path), "msgs")
    msgs = spark.createDataFrame(
        [
            (bytearray(WEBPATH_OK.encode()), "2024-01-01 00:00:00"),
            (bytearray(WEBPATH_MISSING.encode()), "2024-01-01 00:00:01"),
            (bytearray(WEBPATH_BADMETA.encode()), "2024-01-01 00:00:02"),
        ],
        "payload binary, ts_s string",
    ).select("payload", F.col("ts_s").cast("timestamp").alias("ts"))
    msgs.write.mode("overwrite").parquet(inp)
    meta = spark.createDataFrame(
        [
            (WEBPATH_OK, '[{"id":"study-1"}]'),
            (WEBPATH_BADMETA, "not a json array"),
        ],
        "webpath string, metadata string",
    )
    return inp, meta


def test_dicom_pipeline_three_stages(spark, tmp_path):
    inp, meta = _inputs(spark, tmp_path)
    pipe = DicomHarmonizationPipeline(
        mapping_config=DICOM_CFG,
        out_dir=os.path.join(str(tmp_path), "out"),
        trigger={"availableNow": True},
    )
    q = pipe.run(spark, inp, meta, os.path.join(str(tmp_path), "ckpt"))
    q.awaitTermination(300)

    bundles = {r["webpath"]: r["bundle"] for r in pipe.bundles(spark).collect()}
    assert bundles == {
        WEBPATH_OK: '{"resourceType":"Bundle","type":"transaction","entry":'
        '[{"resource":{"Output":[{"study":"study-1"}]},"request":'
        '{"method":"POST","url":"Bundle"}}]}'
    }

    read_errs = pipe.read_err_sink.read_committed(spark).collect()
    assert len(read_errs) == 1
    assert read_errs[0]["dataElement"] == WEBPATH_MISSING
    assert read_errs[0]["statusCode"] == 404

    map_errs = pipe.map_err_sink.read_committed(spark).collect()
    assert len(map_errs) == 1
    assert map_errs[0]["webpath"] == WEBPATH_BADMETA
    assert map_errs[0]["step"] == "mapping"

    assert pipe.write_err_sink.read_committed(spark).count() == 0
    # all four sinks committed the same batch ids (single-pass atomicity)
    assert (
        pipe.bundles_sink.committed_batches()
        == pipe.read_err_sink.committed_batches()
        == pipe.map_err_sink.committed_batches()
        == pipe.write_err_sink.committed_batches()
    )


def test_custom_to_fhir_query_options(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/region.parquet").createOrReplaceTempView("region_v")
    out = custom_to_fhir(
        spark,
        {"Region": "SELECT r_name FROM region_v ORDER BY r_regionkey LIMIT 2"},
        'out Output: P(root);\ndef P(input) { name: input.Region.r_name; }',
    )
    rows = ok_rows(out).orderBy("id").collect()
    assert len(rows) == 2
    assert rows[0]["data"].startswith('{"Region":{"r_name":')
    assert '"resource":{"Output":[{"name":"' in rows[0]["bundle"]
    assert err_rows(out).count() == 0


def test_query_options_validation():
    with pytest.raises(ValueError):
        validate_query_options({})
    with pytest.raises(ValueError):
        validate_query_options({"t": "  "})
