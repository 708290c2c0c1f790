"""Multimodal plumbing invariants: the decode stub's gating behavior, blob
schema types, and frame fan-out arithmetic (the oracle gate in
test_catalog_oracle.py already hash-checks the Arrow outputs)."""

from __future__ import annotations

import pytest

from pyspark.sql.types import BinaryType, StructType

from data_pipeline_team5_spark.operators.multimodal import (
    attach_blob,
    decode_blob,
    sample_frames,
)
from data_pipeline_team5_spark.plans.catalog import table
from tests.conftest import SF_SMALL


def test_decode_stub_gates_missing_codec():
    with pytest.raises((NotImplementedError,)):
        decode_blob(b"\x00\x01", backend="pil")
    assert decode_blob(b"\x00\x01", backend="fake") == b"\x00\x01"
    with pytest.raises(ValueError):
        decode_blob(b"", backend="jpeg2000")


def test_blob_schema_is_binary_plus_struct(spark):
    docs = table(spark, SF_SMALL, "documents")
    blobs = attach_blob(docs)
    fields = dict(blobs.dtypes)
    assert isinstance(blobs.schema["blob"].dataType, BinaryType)
    assert isinstance(blobs.schema["meta"].dataType, StructType)
    assert fields["doc_id"] == "bigint"


def test_frame_fanout_counts(spark):
    docs = table(spark, SF_SMALL, "documents")
    frames = sample_frames(attach_blob(docs))
    per_doc = {r.doc_id: r.cnt for r in
               frames.groupBy("doc_id").count().withColumnRenamed(
                   "count", "cnt").collect()}
    lens = {r.doc_id: r.n for r in
            docs.selectExpr("doc_id", "length(text) AS n").collect()}
    for doc_id, n in lens.items():
        n_frames = (n + 63) // 64
        expect = (n_frames + 3) // 4  # every 4th frame, starting at 0
        assert per_doc.get(doc_id, 0) == expect


def test_resize_is_fixed_shape_and_deterministic(spark):
    from data_pipeline_team5_spark.operators.multimodal import (
        attach_blob,
        resize_blob,
    )
    from data_pipeline_team5_spark.plans.catalog import table
    from tests.conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents").limit(20)
    blobs = attach_blob(docs)
    out = resize_blob(blobs, out_w=8, out_h=8)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.resized) == 64 for r in rows)  # schema-constant size
    assert all((r.out_w, r.out_h) == (8, 8) for r in rows)
    again = {r.doc_id: bytes(r.resized) for r in resize_blob(blobs).collect()}
    assert all(bytes(r.resized) == again[r.doc_id] for r in rows)
