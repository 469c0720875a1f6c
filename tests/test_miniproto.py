"""The from-scratch protobuf wire codec behind the transformWithState
shim (streaming/_miniproto.py): descriptor-blob parse of the installed
pyspark's StateMessage.proto, known-bytes vectors from the public
encoding spec, round-trips, packed repeated handling, and the
sys.modules seeding contract. The REAL validator is the JVM state
server parsing these bytes end-to-end —
tests/test_cep.py::test_streamed_detector_matches_batch_twin and
tests/test_cep_sequence.py::test_match_sequence_stream_e2e."""

from __future__ import annotations

import sys

import pytest

from saber_spark.streaming import _miniproto as mp


@pytest.fixture(scope="module")
def pb2():
    return mp.build_module("_miniproto_test_module")


def test_descriptor_parse_covers_protocol(pb2):
    """Every message the pyspark state clients construct must exist."""
    for name in [
        "StateRequest", "StateResponse", "StatefulProcessorCall",
        "SetHandleState", "ImplicitGroupingKeyRequest", "SetImplicitKey",
        "RemoveImplicitKey", "StateCallCommand", "TimerStateCallCommand",
        "RegisterTimer", "DeleteTimer", "ListTimers", "ExpiryTimerRequest",
        "TimerRequest", "TimerValueRequest", "GetProcessingTime",
        "GetWatermark", "UtilsRequest", "ParseStringSchema",
        "StateVariableRequest", "ValueStateCall", "ListStateCall",
        "MapStateCall", "Exists", "Get", "Clear", "ValueStateUpdate",
        "AppendValue", "AppendList", "ListStatePut", "ListStateGet",
        "GetValue", "ContainsKey", "UpdateValue", "RemoveKey",
        "StateResponseWithLongTypeVal", "StateResponseWithStringTypeVal",
        "StateResponseWithListGet", "StateResponseWithMapKeysOrValues",
        "StateResponseWithTimer",
    ]:
        assert hasattr(pb2, name), name
    # top-level HandleState enum values are module constants (pb2 style)
    assert pb2.PRE_INIT == 0 and pb2.CLOSED == 5


def test_known_bytes_vectors(pb2):
    """Hand-computed wire bytes from the public encoding spec."""
    # field 1 varint 1 -> tag 0x08
    assert pb2.StateRequest(version=1).SerializeToString() == b"\x08\x01"
    # empty submessage field MUST serialize (it selects the oneof arm)
    call = pb2.ImplicitGroupingKeyRequest(removeImplicitKey=pb2.RemoveImplicitKey())
    raw = call.SerializeToString()
    assert len(raw) == 2 and raw[1] == 0  # tag + zero length
    # string field: length-delimited utf-8
    m = pb2.ParseStringSchema(schema="ab")
    assert m.SerializeToString() == b"\x0a\x02ab"


def test_roundtrip_scalars_and_negatives(pb2):
    m = pb2.StateResponseWithLongTypeVal(
        statusCode=-2, errorMessage="boom", value=-(2**40)
    )
    r = pb2.StateResponseWithLongTypeVal.FromString(m.SerializeToString())
    assert (r.statusCode, r.errorMessage, r.value) == (-2, "boom", -(2**40))
    # proto3 defaults on absent fields
    empty = pb2.StateResponse.FromString(b"")
    assert empty.statusCode == 0 and empty.errorMessage == ""


def test_nested_oneof_roundtrip(pb2):
    req = pb2.StateRequest(
        statefulProcessorCall=pb2.StatefulProcessorCall(
            setHandleState=pb2.SetHandleState(state=pb2.DATA_PROCESSED)
        )
    )
    back = pb2.StateRequest.FromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == pb2.DATA_PROCESSED


def test_attribute_assignment_and_ttl_vivify(pb2):
    """The api client's `cmd.ttl.durationMs = n` mutation pattern."""
    cmd = pb2.StateCallCommand()
    cmd.stateName = "s"
    cmd.schema = "{}"
    cmd.ttl.durationMs = 5000
    back = pb2.StateCallCommand.FromString(cmd.SerializeToString())
    assert back.stateName == "s" and back.ttl.durationMs == 5000
    with pytest.raises(AttributeError):
        cmd.notAField = 1


def test_unknown_fields_are_skipped(pb2):
    # future-proofing: a response carrying an unknown field (here tag
    # field-100/varint) must not break parsing of known ones
    raw = b"\xa0\x06\x2a" + pb2.StateResponse(statusCode=7).SerializeToString()
    r = pb2.StateResponse.FromString(raw)
    assert r.statusCode == 7


def test_ensure_seeds_sys_modules():
    assert mp.ensure() is True
    try:
        # when a real protobuf runtime is present, ensure() correctly
        # steps aside WITHOUT seeding sys.modules (the driver only
        # imports the pb2 lazily) — only shim-mode must seed
        from google.protobuf import descriptor  # noqa: F401

        return
    except ImportError:
        pass
    name = mp._PB2_NAME
    assert name in sys.modules
    mod = sys.modules[name]
    assert hasattr(mod, "StateRequest")


def test_extract_serialized_literal_survives_escaped_quote_before_paren():
    r"""A descriptor blob containing the byte pair 0x27 0x29 (rendered
    \') must parse whole — the previous non-greedy regex truncated at
    the first quote-then-')' and tripped the availability gate."""
    from saber_spark.streaming._miniproto import _extract_serialized_literal

    blob = b"abc')def"  # 0x27 0x29 inside the payload
    literal = repr(blob)  # "b\"abc')def\"" — python picks a safe quote
    src = f"DESCRIPTOR = _pool.AddSerializedFile(\n  {literal}\n)\n"
    assert _extract_serialized_literal(src) == blob
    # and the single-quoted form, where the hazard is an ESCAPED quote
    src2 = "DESCRIPTOR = _pool.AddSerializedFile(b'abc\\')def')\n"
    assert _extract_serialized_literal(src2) == blob
