"""Unit tests for the vendored mini-protobuf runtime
(spider_spark/protoshim) against pyspark's shipped StateMessage gencode.

The wire-format expectations below are literal byte strings written from
the public encoding spec (https://protobuf.dev/programming-guides/
encoding/), NOT produced by the code under test — so serialization and
parsing are each checked against an independent reference. Field numbers
are read from the parsed descriptor and asserted where a literal
expectation depends on them.

No SparkSession needed; the end-to-end transformWithStateInPandas
integration runs in tests/test_stateful_streaming.py (and the
standalone scripts/tws_validate.py job).
"""

from __future__ import annotations

import pytest

from spider_spark import protoshim

protoshim.install()

from google.protobuf import _wire  # noqa: E402
from google.protobuf import descriptor as gp_descriptor  # noqa: E402

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


# ---------------------------------------------------------------------------
# wire primitives vs spec literals
# ---------------------------------------------------------------------------


def test_varint_spec_literals():
    # examples straight from the encoding guide
    assert _wire.encode_varint(1) == b"\x01"
    assert _wire.encode_varint(150) == b"\x96\x01"
    assert _wire.encode_varint(300) == b"\xac\x02"
    # negative ints travel as 64-bit two's complement: always 10 bytes
    assert _wire.encode_varint(-1) == b"\xff" * 9 + b"\x01"
    assert _wire.encode_varint(-5) == b"\xfb" + b"\xff" * 8 + b"\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)):
        raw, pos = _wire.decode_varint(_wire.encode_varint(v), 0)
        assert _wire.to_signed64(raw) == v
        assert pos == len(_wire.encode_varint(v))


def test_zigzag_spec_literals():
    # spec table: 0->0, -1->1, 1->2, -2->3, 2147483647->4294967294
    assert _wire.zigzag_encode(0) == 0
    assert _wire.zigzag_encode(-1) == 1
    assert _wire.zigzag_encode(1) == 2
    assert _wire.zigzag_encode(-2) == 3
    assert _wire.zigzag_encode(2147483647) == 4294967294
    for v in (0, -1, 1, -2, 2, -(2**62), 2**62):
        assert _wire.zigzag_decode(_wire.zigzag_encode(v)) == v


def test_tag_and_len_delimited():
    # field 1 varint -> tag 0x08; field 2 LEN -> tag 0x12 (spec examples)
    assert _wire.encode_tag(1, 0) == b"\x08"
    assert _wire.encode_tag(2, 2) == b"\x12"
    assert _wire.encode_len_delimited(2, b"abc") == b"\x12\x03abc"


def test_iter_fields_skips_unknown_and_groups():
    buf = (
        b"\x08\x02"  # field 1 varint 2
        + b"\x3a\x01\x41"  # field 7 LEN "A" (unknown to most messages)
        + b"\x1d\x01\x00\x00\x00"  # field 3 fixed32
    )
    got = list(_wire.iter_fields(buf))
    assert got[0] == (1, 0, 2)
    assert got[1] == (7, 2, b"A")
    assert got[2] == (3, 5, b"\x01\x00\x00\x00")


# ---------------------------------------------------------------------------
# gencode module surface
# ---------------------------------------------------------------------------


def test_gencode_module_built():
    # message classes exist and carry descriptors
    for name in (
        "StateRequest",
        "StateResponse",
        "StatefulProcessorCall",
        "SetHandleState",
        "TimerInfo",
        "StateResponseWithTimer",
        "KeyAndValuePair",
    ):
        cls = getattr(sm, name)
        assert cls.DESCRIPTOR.name == name
    # file-level enum values are module constants (client uses them)
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.CLOSED == 5
    # wrapper with Name/Value lookups
    assert sm.HandleState.Value("CREATED") == sm.CREATED
    assert sm.HandleState.Name(sm.CLOSED) == "CLOSED"
    # descriptor bookkeeping the generated module wrote post-build
    assert hasattr(sm._STATEREQUEST, "_serialized_start")


def test_descriptor_field_linking():
    d = sm.StateRequest.DESCRIPTOR
    f = d.fields_by_name["statefulProcessorCall"]
    assert f.type == gp_descriptor.FieldDescriptor.TYPE_MESSAGE
    assert f.message_type is sm.StatefulProcessorCall.DESCRIPTOR
    assert f.containing_oneof is not None and f.containing_oneof.name == "method"
    state_f = sm.SetHandleState.DESCRIPTOR.fields_by_name["state"]
    assert state_f.type == gp_descriptor.FieldDescriptor.TYPE_ENUM
    assert state_f.enum_type.values_by_name["CREATED"].number == 1


# ---------------------------------------------------------------------------
# message semantics against spec-literal bytes
# ---------------------------------------------------------------------------


def test_serialize_simple_request_literal_bytes():
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    req = sm.StateRequest(version=2)
    assert req.SerializeToString() == b"\x08\x02"


def test_parse_literal_response_bytes():
    d = sm.StateResponse.DESCRIPTOR
    n_status = d.fields_by_name["statusCode"].number
    n_err = d.fields_by_name["errorMessage"].number
    n_val = d.fields_by_name["value"].number
    buf = (
        _wire.encode_tag(n_status, 0)
        + b"\x03"
        + _wire.encode_tag(n_err, 2)
        + b"\x04boom"
        + _wire.encode_tag(n_val, 2)
        + b"\x02\x01\xff"
    )
    resp = sm.StateResponse()
    resp.ParseFromString(buf)
    assert resp.statusCode == 3
    assert resp.errorMessage == "boom"
    assert resp.value == b"\x01\xff"


def test_negative_int64_roundtrip():
    # GetWatermark responses can legitimately be negative
    msg = sm.StateResponseWithLongTypeVal(statusCode=0, value=-1)
    out = msg.SerializeToString()
    n_val = sm.StateResponseWithLongTypeVal.DESCRIPTOR.fields_by_name[
        "value"
    ].number
    assert (_wire.encode_tag(n_val, 0) + b"\xff" * 9 + b"\x01") in out
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(out)
    assert back.value == -1


def test_nested_oneof_request_roundtrip():
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert (
        back.statefulProcessorCall.setHandleState.state == sm.CREATED
    )


def test_oneof_set_clears_siblings():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req._set_field(
        sm.StateRequest.DESCRIPTOR.fields_by_name["implicitGroupingKeyRequest"],
        sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"k")
        ),
    )
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not req.HasField("statefulProcessorCall")


def test_oneof_zero_enum_member_still_serializes():
    # explicit presence: PRE_INIT == 0 inside a set message must emit
    # bytes (an empty SetHandleState submessage on the wire), not vanish
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
    )
    data = call.SerializeToString()
    assert data != b""
    back = sm.StatefulProcessorCall()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "setHandleState"
    assert back.setHandleState.state == sm.PRE_INIT


def test_repeated_message_roundtrip():
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"a", timestampMs=10),
            sm.TimerInfo(timestampMs=-7),
        ],
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (b"a", 10),
        (b"", -7),
    ]


def test_unknown_fields_skipped():
    base = sm.StateResponse(statusCode=1).SerializeToString()
    # append a field number no StateResponse revision uses (200, LEN)
    extra = _wire.encode_len_delimited(200, b"future-data")
    back = sm.StateResponse()
    back.ParseFromString(base + extra)
    assert back.statusCode == 1


def test_unset_scalar_and_message_defaults():
    resp = sm.StateResponse()
    assert resp.statusCode == 0
    assert resp.errorMessage == ""
    assert resp.value == b""
    req = sm.StateRequest()
    # unset singular message reads as a default instance
    assert req.statefulProcessorCall.setHandleState.state == sm.PRE_INIT
    assert not req.HasField("statefulProcessorCall")


def test_parse_from_string_resets_previous_state():
    msg = sm.StateResponse(statusCode=5, errorMessage="old")
    msg.ParseFromString(sm.StateResponse(statusCode=1).SerializeToString())
    assert msg.statusCode == 1
    assert msg.errorMessage == ""  # cleared, not merged


def test_real_runtime_precedence_reporting():
    # install() is idempotent and reports shim state truthfully
    assert protoshim.install() is True  # shim already active in this run
    import google.protobuf as gp

    assert getattr(gp, "_SPIDER_SPARK_SHIM", False) is True
