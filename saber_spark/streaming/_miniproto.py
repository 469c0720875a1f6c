"""Minimal protobuf runtime for the transformWithState worker protocol.

PySpark's ``transformWithStateInPandas`` Python workers speak protobuf
(``StateMessage.proto``) to the JVM's state server, and every pb2 import
in pyspark is LAZY (inside the client methods) — but the generated
``StateMessage_pb2`` module needs the ``google.protobuf`` runtime, which
this container does not ship and cannot install. This module removes
that gate from first principles:

- a from-scratch implementation of the protobuf WIRE FORMAT (public
  spec: https://protobuf.dev/programming-guides/encoding/ — varint,
  zigzag, fixed32/64, length-delimited, packed repeated), and
- a from-scratch parser for the serialized ``FileDescriptorProto`` blob
  embedded in the installed pyspark's ``StateMessage_pb2.py`` (the
  descriptor format is itself a protobuf message, so the same decoder
  reads it). Field names/numbers/types come from the INSTALLED pyspark,
  so the shim tracks whatever Spark version is present instead of
  hard-coding a message list.

``ensure()`` builds message classes from that descriptor and seeds
``sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"]``; the
lazy ``import ... as stateMessage`` statements inside
``stateful_processor_api_client`` / ``{value,list,map}_state_client``
then resolve to the shim. When a real ``google.protobuf`` is available
the shim steps aside entirely.

Compatibility notes (what the JVM peer requires and the shim provides):
proto3 semantics — unset scalars are not serialized; EXPLICITLY passed
or assigned fields are serialized even when zero-valued/empty (a
zero-length submessage field is how oneof arms like
``StatefulProcessorCall(setHandleState=...)`` select their case);
repeated numeric fields encode packed and decode packed or unpacked;
unknown response fields are skipped by wire type. Deviation from real
protobuf (documented, harmless here): reading a message-typed field
auto-vivifies AND marks it set — pyspark's only such read is the
``command.ttl.durationMs = …`` mutation pattern, where marking set is
exactly right.

Reference analogue: none — this unlocks running the arbitrary-state CEP
processors (streaming/cep.py) end-to-end, which Saber cannot express at
all (its pipelines are hand-built operator DAGs, scheduling/W1.java).
"""

from __future__ import annotations

import ast
import re
import struct
import sys
import types

# -- wire-format primitives (protobuf encoding spec) ------------------------

_MASK64 = (1 << 64) - 1


def _enc_varint(out: bytearray, v: int) -> None:
    v &= _MASK64  # negatives: 64-bit two's complement, 10-byte varint
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


# FieldDescriptorProto.Type values (public descriptor.proto)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_VARINT_TYPES = {_T_INT64, _T_UINT64, _T_INT32, _T_BOOL, _T_UINT32, _T_ENUM,
                 _T_SINT32, _T_SINT64}
_FIXED64_TYPES = {_T_DOUBLE, _T_FIXED64, _T_SFIXED64}
_FIXED32_TYPES = {_T_FLOAT, _T_FIXED32, _T_SFIXED32}
_LEN_TYPES = {_T_STRING, _T_BYTES, _T_MESSAGE}


def _wire_type(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return 0
    if ftype in _FIXED64_TYPES:
        return 1
    if ftype in _LEN_TYPES:
        return 2
    if ftype in _FIXED32_TYPES:
        return 5
    raise ValueError(f"unsupported field type {ftype}")


def _enc_scalar(out: bytearray, ftype: int, v) -> None:
    """Encode one scalar payload (no tag)."""
    if ftype == _T_SINT32:
        _enc_varint(out, ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF)
    elif ftype == _T_SINT64:
        _enc_varint(out, ((v << 1) ^ (v >> 63)) & _MASK64)
    elif ftype in _VARINT_TYPES:
        _enc_varint(out, int(v))
    elif ftype == _T_DOUBLE:
        out += struct.pack("<d", v)
    elif ftype == _T_FLOAT:
        out += struct.pack("<f", v)
    elif ftype == _T_FIXED64:
        out += struct.pack("<Q", v & _MASK64)
    elif ftype == _T_SFIXED64:
        out += struct.pack("<q", v)
    elif ftype == _T_FIXED32:
        out += struct.pack("<I", v & 0xFFFFFFFF)
    elif ftype == _T_SFIXED32:
        out += struct.pack("<i", v)
    elif ftype == _T_STRING:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        _enc_varint(out, len(b))
        out += b
    elif ftype == _T_BYTES:
        b = bytes(v)
        _enc_varint(out, len(b))
        out += b
    else:
        raise ValueError(f"unsupported scalar type {ftype}")


def _dec_scalar(ftype: int, buf: bytes, i: int) -> tuple[object, int]:
    """Decode one scalar payload at ``i`` (tag already consumed)."""
    if ftype in _VARINT_TYPES:
        v, i = _dec_varint(buf, i)
        if ftype == _T_SINT32:
            v = (v >> 1) ^ -(v & 1)
        elif ftype == _T_SINT64:
            v = (v >> 1) ^ -(v & 1)
        elif ftype == _T_BOOL:
            v = bool(v)
        elif ftype in (_T_INT32, _T_INT64) and v >= 1 << 63:
            v -= 1 << 64  # negatives arrive as 64-bit two's complement
        return v, i
    if ftype == _T_DOUBLE:
        return struct.unpack_from("<d", buf, i)[0], i + 8
    if ftype == _T_FIXED64:
        return struct.unpack_from("<Q", buf, i)[0], i + 8
    if ftype == _T_SFIXED64:
        return struct.unpack_from("<q", buf, i)[0], i + 8
    if ftype == _T_FLOAT:
        return struct.unpack_from("<f", buf, i)[0], i + 4
    if ftype == _T_FIXED32:
        return struct.unpack_from("<I", buf, i)[0], i + 4
    if ftype == _T_SFIXED32:
        return struct.unpack_from("<i", buf, i)[0], i + 4
    if ftype in (_T_STRING, _T_BYTES):
        n, i = _dec_varint(buf, i)
        raw = buf[i : i + n]
        return (raw.decode("utf-8") if ftype == _T_STRING else raw), i + n
    raise ValueError(f"unsupported scalar type {ftype}")


def _skip_field(wt: int, buf: bytes, i: int) -> int:
    if wt == 0:
        _, i = _dec_varint(buf, i)
        return i
    if wt == 1:
        return i + 8
    if wt == 2:
        n, i = _dec_varint(buf, i)
        return i + n
    if wt == 5:
        return i + 4
    raise ValueError(f"cannot skip wire type {wt}")


# -- raw decoder: bytes -> {field_number: [values-by-wire-type]} -----------
# used to read descriptor.proto messages, where we hand-pick fields


def _raw_fields(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        tag, i = _dec_varint(buf, i)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _dec_varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            n, i = _dec_varint(buf, i)
            v, i = buf[i : i + n], i + n
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        out.setdefault(num, []).append(v)
    return out


class _Field:
    __slots__ = ("name", "number", "ftype", "repeated", "type_name")

    def __init__(self, name, number, ftype, repeated, type_name):
        self.name = name
        self.number = number
        self.ftype = ftype
        self.repeated = repeated
        self.type_name = type_name  # fully-qualified, message/enum only


def _parse_descriptor(blob: bytes):
    """FileDescriptorProto -> (package, messages, enums).

    messages: {full_name: [_Field...]}; enums: {full_name: {name: num}}.
    Only the fields the codec needs are read (names, numbers, types,
    labels, nesting) — options/oneof indexes/etc. are skipped."""
    f = _raw_fields(blob)
    package = f.get(2, [b""])[0].decode()

    messages: dict[str, list[_Field]] = {}
    enums: dict[str, dict[str, int]] = {}

    def walk_enum(raw: bytes, scope: str) -> None:
        e = _raw_fields(raw)
        name = e[1][0].decode()
        vals = {}
        for v in e.get(2, []):
            vf = _raw_fields(v)
            vals[vf[1][0].decode()] = vf.get(2, [0])[0]
        enums[f"{scope}.{name}"] = vals

    def walk_msg(raw: bytes, scope: str) -> None:
        m = _raw_fields(raw)
        name = m[1][0].decode()
        full = f"{scope}.{name}"
        fields = []
        for fd in m.get(2, []):
            ff = _raw_fields(fd)
            fields.append(
                _Field(
                    ff[1][0].decode(),
                    ff[3][0],
                    ff[5][0],
                    ff.get(4, [1])[0] == 3,  # label 3 = repeated
                    ff[6][0].decode().lstrip(".") if 6 in ff else None,
                )
            )
        messages[full] = fields
        for nested in m.get(3, []):
            walk_msg(nested, full)
        for en in m.get(4, []):
            walk_enum(en, full)

    for raw in f.get(4, []):
        walk_msg(raw, package)
    for raw in f.get(5, []):
        walk_enum(raw, package)
    return package, messages, enums


# -- message classes ---------------------------------------------------------


class MiniMessage:
    """protobuf-message stand-in: kwargs/attribute field assignment,
    SerializeToString, ParseFromString/FromString. Class attributes
    ``_FIELDS`` (name -> _Field), ``_BY_NUM``, ``_MSG_CLS`` (field name
    -> nested MiniMessage class) are installed by ``_build_classes``."""

    _FIELDS: dict = {}
    _BY_NUM: dict = {}
    _MSG_CLS: dict = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_vals", {})
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if name not in self._FIELDS:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        self._vals[name] = value

    def __getattr__(self, name):
        fld = self._FIELDS.get(name)
        if fld is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if fld.repeated:
            return self._vals.setdefault(name, [])
        if fld.ftype == _T_MESSAGE:
            # auto-vivify so `msg.sub.field = x` mutates-and-marks-set
            return self._vals.setdefault(name, self._MSG_CLS[name]())
        if name in self._vals:
            return self._vals[name]
        return {_T_STRING: "", _T_BYTES: b"", _T_BOOL: False,
                _T_DOUBLE: 0.0, _T_FLOAT: 0.0}.get(fld.ftype, 0)

    # -- encode --
    def SerializeToString(self) -> bytes:
        out = bytearray()
        for name in sorted(self._vals, key=lambda n: self._FIELDS[n].number):
            fld = self._FIELDS[name]
            val = self._vals[name]
            wt = _wire_type(fld.ftype)
            if fld.repeated:
                if not val:
                    continue
                if wt in (0, 1, 5) and fld.ftype != _T_GROUP:
                    # packed (proto3 default for numeric repeated)
                    payload = bytearray()
                    for v in val:
                        _enc_scalar(payload, fld.ftype, v)
                    _enc_varint(out, (fld.number << 3) | 2)
                    _enc_varint(out, len(payload))
                    out += payload
                else:
                    for v in val:
                        _enc_varint(out, (fld.number << 3) | wt)
                        self._enc_one(out, fld, v)
            else:
                _enc_varint(out, (fld.number << 3) | wt)
                self._enc_one(out, fld, val)
        return bytes(out)

    def _enc_one(self, out: bytearray, fld: _Field, v) -> None:
        if fld.ftype == _T_MESSAGE:
            sub = v.SerializeToString()
            _enc_varint(out, len(sub))
            out += sub
        else:
            _enc_scalar(out, fld.ftype, v)

    # -- decode --
    def ParseFromString(self, data: bytes) -> int:
        self._vals.clear()
        buf = bytes(data)
        i = 0
        while i < len(buf):
            tag, i = _dec_varint(buf, i)
            num, wt = tag >> 3, tag & 7
            fld = self._BY_NUM.get(num)
            if fld is None:
                i = _skip_field(wt, buf, i)
                continue
            if fld.ftype == _T_MESSAGE:
                n, i = _dec_varint(buf, i)
                sub = self._MSG_CLS[fld.name]()
                sub.ParseFromString(buf[i : i + n])
                i += n
                if fld.repeated:
                    self._vals.setdefault(fld.name, []).append(sub)
                else:
                    self._vals[fld.name] = sub
            elif fld.repeated and wt == 2 and fld.ftype not in _LEN_TYPES:
                n, i = _dec_varint(buf, i)  # packed numeric
                end = i + n
                lst = self._vals.setdefault(fld.name, [])
                while i < end:
                    v, i = _dec_scalar(fld.ftype, buf, i)
                    lst.append(v)
            else:
                v, i = _dec_scalar(fld.ftype, buf, i)
                if fld.repeated:
                    self._vals.setdefault(fld.name, []).append(v)
                else:
                    self._vals[fld.name] = v
        return len(buf)

    @classmethod
    def FromString(cls, data: bytes):
        m = cls()
        m.ParseFromString(data)
        return m

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._vals.items())
        return f"{type(self).__name__}({inner})"


def _build_classes(package: str, messages: dict, enums: dict) -> dict:
    """Dynamic class per message; returns {export_name: obj} with
    top-level messages under their simple names, nested ones as
    ``Parent.Nested`` attributes (pb2 convention), and every enum VALUE
    as a module-level constant (pb2 exports top-level enum values and
    the clients use them as ``stateMessage.PRE_INIT``)."""
    classes: dict[str, type] = {}
    for full in messages:
        classes[full] = type(full.rsplit(".", 1)[-1], (MiniMessage,), {})
    for full, fields in messages.items():
        cls = classes[full]
        cls._FIELDS = {f.name: f for f in fields}
        cls._BY_NUM = {f.number: f for f in fields}
        cls._MSG_CLS = {
            f.name: classes[f.type_name]
            for f in fields
            if f.ftype == _T_MESSAGE and f.type_name in classes
        }
        missing = [
            f.name
            for f in fields
            if f.ftype == _T_MESSAGE and f.type_name not in classes
        ]
        if missing:
            raise ValueError(f"{full}: unresolved submessage types {missing}")

    exports: dict[str, object] = {}
    for full, cls in classes.items():
        rel = full[len(package) + 1 :] if full.startswith(package + ".") else full
        parts = rel.split(".")
        if len(parts) == 1:
            exports[parts[0]] = cls
        else:  # attach nested classes to their parent (pb2 style)
            parent = classes[f"{package}.{'.'.join(parts[:-1])}"]
            setattr(parent, parts[-1], cls)
    for full, vals in enums.items():
        rel = full[len(package) + 1 :] if full.startswith(package + ".") else full
        target = exports if "." not in rel else None
        for vname, vnum in vals.items():
            if target is not None:
                target[vname] = vnum
            else:  # nested enum: values live on the enclosing class
                parent = classes[f"{package}.{rel.rsplit('.', 1)[0]}"]
                setattr(parent, vname, vnum)
    return exports


_PB2_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"


def _descriptor_blob() -> bytes:
    """The serialized FileDescriptorProto from the INSTALLED pyspark's
    generated module — read as source, never imported (importing it is
    exactly what needs google.protobuf)."""
    import importlib.util

    # an installed shim (no loader) must not shadow the lookup of the
    # REAL generated file — find_spec raises on spec-less sys.modules
    # entries, so resolve with the entry popped and restore after
    seeded = sys.modules.pop(_PB2_NAME, None)
    try:
        spec = importlib.util.find_spec(_PB2_NAME)
    finally:
        if seeded is not None:
            sys.modules[_PB2_NAME] = seeded
    if spec is None or spec.loader is None:
        raise FileNotFoundError(_PB2_NAME)
    # loader.get_source works for plain files AND zipimport (workers run
    # pyspark out of pyspark.zip, where open(spec.origin) cannot)
    src = spec.loader.get_source(_PB2_NAME)
    if src is None:
        with open(spec.origin, "r", encoding="utf-8") as f:
            src = f.read()
    try:
        return _extract_serialized_literal(src)
    except ValueError:
        raise ValueError(f"no serialized descriptor found in {spec.origin}")


def _extract_serialized_literal(src: str) -> bytes:
    """The bytes literal passed to ``AddSerializedFile``. Scans to the
    literal's TERMINATING quote honoring backslash escapes — a
    non-greedy regex to "quote then ')'" would truncate the blob at any
    embedded \' or \" byte pair that happens to precede a ')' char,
    leaving an unterminated literal."""
    m = re.search(r"AddSerializedFile\(\s*b(['\"])", src)
    if not m:
        raise ValueError("no serialized descriptor")
    q = m.group(1)
    i = j = m.end()
    while True:
        c = src[j]  # IndexError on an unterminated literal -> gate trips
        if c == "\\":
            j += 2
            continue
        if c == q:
            break
        j += 1
    return ast.literal_eval(f"b{q}{src[i:j]}{q}")


def build_module(name: str = _PB2_NAME) -> types.ModuleType:
    package, messages, enums = _parse_descriptor(_descriptor_blob())
    mod = types.ModuleType(name)
    mod.__dict__.update(_build_classes(package, messages, enums))
    mod.__package__ = name.rsplit(".", 1)[0]
    # a real ModuleSpec keeps importlib introspection (find_spec et al.)
    # working on the seeded entry
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def ensure() -> bool:
    """Make ``import pyspark...StateMessage_pb2`` succeed in THIS
    process: no-op when the real runtime (or a prior install) is
    present, otherwise seed sys.modules with the shim. Returns whether
    the transformWithState protocol can run. Called at import of
    saber_spark.streaming.cep, which runs on the driver AND inside every
    worker before any state-server call (workers unpickle the processor
    — importing its module — before the first lazy pb2 import)."""
    if _PB2_NAME in sys.modules:
        return True
    try:
        # probe the symbol the generated pb2 actually imports — a bare
        # `import google.protobuf` can succeed as an EMPTY namespace
        # package when some unrelated `google/` dir is on sys.path
        from google.protobuf import descriptor  # noqa: F401

        return True  # real runtime present: the generated pb2 will load
    except ImportError:
        pass
    try:
        sys.modules[_PB2_NAME] = build_module()
        return True
    except Exception:
        return False
