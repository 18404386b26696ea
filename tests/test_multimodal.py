"""Multimodal plumbing: mapInPandas features == Python reference; real
decoders stay stubbed (the container ships no media libs)."""

from __future__ import annotations

import pytest

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.llm.multimodal import decode_image, fake_features
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_extract_matches_python_reference(spark):
    out = {
        r["doc_id"]: r for r in engine.QUERIES["multimodal_extract"](spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").limit(20).collect()
    assert len(out) >= len(docs)
    for d in docs:
        ref = fake_features(d["text"].encode("utf-8"))
        got = out[d["doc_id"]]
        assert got["n_bytes"] == ref["n_bytes"]
        assert got["n_frames"] == ref["n_frames"]
        assert got["mean_byte"] == ref["mean_byte"]
        assert got["first_frame_sum"] == ref["first_frame_sum"]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_meta_agrees_with_extract(spark):
    meta = {
        r["doc_id"]: r["n_bytes"]
        for r in engine.QUERIES["multimodal_meta"](spark, SF_DIR).collect()
    }
    ext = {
        r["doc_id"]: r["n_bytes"]
        for r in engine.QUERIES["multimodal_extract"](spark, SF_DIR).collect()
    }
    assert meta == ext  # JVM-side metadata == Python-side feature extract


def test_resize_matches_python_stride(spark):
    """resize_payload == payload[::stride] byte-for-byte."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.multimodal import RESIZE_STRIDE, resize_payload
    from ls_hadoop_3_0_spark.tables import load

    docs = load(spark, SF_DIR, "documents").limit(20)
    payload_df = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    got = {
        r["doc_id"]: bytes(r["payload_small"])
        for r in resize_payload(payload_df).collect()
    }
    want = {
        r["doc_id"]: r["text"].encode("utf-8")[::RESIZE_STRIDE]
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == want
