"""Vendored protobuf shim (vendor/pyshims) — wire-format unit tests.

The shim must be WIRE-compatible with the Java protobuf parser behind
Spark's transformWithStateInPandas state server, so these tests pin
exact byte sequences (hand-derived from the public encoding spec), not
just self-round-trips. The end-to-end proof is the executable T6 test
in test_streaming.py and the stamped stream_batch_equiv_stateful key.
"""

from __future__ import annotations

import sys

import pytest

from ls_hadoop_3_0_spark import vendor

vendor.ensure_protobuf_env()

sm = pytest.importorskip(
    "pyspark.sql.streaming.proto.StateMessage_pb2",
    reason="pb2 gencode requires the shim (or a real protobuf)",
)


def test_exact_bytes_nested_oneof_enum():
    """field2 LEN { field1 LEN { field1 varint=2 } } — hand-computed."""
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_exact_bytes_default_scalars_are_skipped():
    """proto3: unset / default-valued scalars produce NO bytes."""
    assert sm.StateResponse().SerializeToString() == b""
    assert sm.StateResponse(statusCode=0, errorMessage="").SerializeToString() == b""
    # statusCode=1 → tag 0x08, varint 1
    assert sm.StateResponse(statusCode=1).SerializeToString() == bytes.fromhex("0801")


def test_exact_bytes_empty_message_in_oneof_is_emitted():
    """An explicitly-set empty submessage must serialize as a
    zero-length LEN field (Java reads the oneof case from it)."""
    v = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    # field1 LEN "s" = 0a 01 73 ; field2(exists) LEN len=0 = 12 00
    assert v.SerializeToString() == bytes.fromhex("0a01731200")


def test_negative_int64_ten_byte_varint():
    t = sm.TimerInfo(timestampMs=-1)
    # field2 varint: tag 0x10 + ten 0xff..0x01 bytes
    assert t.SerializeToString() == bytes.fromhex("10ffffffffffffffffff01")
    t2 = sm.TimerInfo()
    t2.ParseFromString(t.SerializeToString())
    assert t2.timestampMs == -1


def test_roundtrip_repeated_bytes_and_bool():
    r = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bb", b""], requireNextFetch=True
    )
    out = sm.StateResponseWithListGet()
    out.ParseFromString(r.SerializeToString())
    assert list(out.value) == [b"a", b"bb", b""]
    assert out.requireNextFetch is True
    assert out.errorMessage == ""


def test_roundtrip_repeated_message():
    mi = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=False,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(mi.SerializeToString())
    assert [(p.key, p.value) for p in out.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_oneof_last_writer_wins_and_whichoneof():
    r = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01")
        )
    )
    assert r.WhichOneof("method") == "implicitGroupingKeyRequest"
    # constructing with a different oneof member replaces the arm
    r2 = sm.StateRequest()
    r2.ParseFromString(r.SerializeToString())
    assert r2.implicitGroupingKeyRequest.setImplicitKey.key == b"\x00\x01"
    assert not r2.HasField("statefulProcessorCall")


def test_unknown_fields_are_skipped():
    """Bytes carrying an unknown high-numbered field must not break
    parsing of known fields (forward compatibility)."""
    known = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = bytes.fromhex("f80601")  # field 111 varint 1
    out = sm.StateResponse()
    out.ParseFromString(known + unknown)
    assert out.statusCode == 7


def test_enum_constants_and_wrapper():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("DATA_PROCESSED") == sm.DATA_PROCESSED
    assert sm.HandleState.Name(sm.TIMER_PROCESSED) == "TIMER_PROCESSED"


def test_string_utf8_roundtrip():
    p = sm.ParseStringSchema(schema="a INT, é STRING")
    out = sm.ParseStringSchema()
    out.ParseFromString(p.SerializeToString())
    assert out.schema == "a INT, é STRING"


def test_shim_does_not_shadow_real_protobuf():
    """The shim path is appended only when google.protobuf is otherwise
    missing; if a real runtime exists the shim must stay inactive."""
    import google.protobuf as gp

    shim_root = vendor._PYSHIMS
    if (gp.__file__ or "").startswith(shim_root):
        assert shim_root in sys.path  # ours, activated deliberately
    else:  # real runtime present: vendored path must not have hijacked it
        assert not (gp.__file__ or "").startswith(shim_root)
