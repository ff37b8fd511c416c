"""Dynamic protobuf message runtime: keyword construction,
``SerializeToString`` / ``ParseFromString``, attribute access, oneof
bookkeeping. Concrete classes are created by ``internal.builder`` from
parsed descriptors; this module holds their shared behavior.

Presence semantics: every field explicitly set (constructor kwarg,
attribute assignment, or parsed from the wire) serializes — including
zero values. Proto3 canonical encoders omit zero-valued non-oneof
scalars; emitting them is equally valid wire data (decoders treat an
explicit zero exactly like an omitted field), and keeping presence
explicit makes oneof members with zero payloads (e.g. enum value 0
inside a request oneof) round-trip correctly.
"""

from __future__ import annotations

import struct

from . import _wire
from .descriptor import FieldDescriptor as _FD

_VARINT_TYPES = {
    _FD.TYPE_INT32,
    _FD.TYPE_INT64,
    _FD.TYPE_UINT32,
    _FD.TYPE_UINT64,
    _FD.TYPE_BOOL,
    _FD.TYPE_ENUM,
}
_ZIGZAG_TYPES = {_FD.TYPE_SINT32, _FD.TYPE_SINT64}
_FIXED64_TYPES = {_FD.TYPE_FIXED64, _FD.TYPE_SFIXED64, _FD.TYPE_DOUBLE}
_FIXED32_TYPES = {_FD.TYPE_FIXED32, _FD.TYPE_SFIXED32, _FD.TYPE_FLOAT}
_LEN_TYPES = {_FD.TYPE_STRING, _FD.TYPE_BYTES, _FD.TYPE_MESSAGE}


class Error(Exception):
    pass


class DecodeError(Error):
    pass


class EncodeError(Error):
    pass


class _RepeatedField(list):
    """List with the protobuf repeated-composite ``add()`` helper."""

    def __init__(self, field_desc, message_cls):
        super().__init__()
        self._field_desc = field_desc
        self._message_cls = message_cls

    def add(self, **kwargs):
        if self._message_cls is None:
            raise TypeError("add() is only valid on repeated message fields")
        msg = self._message_cls(**kwargs)
        self.append(msg)
        return msg


def _default_scalar(fd):
    t = fd.type
    if t == _FD.TYPE_STRING:
        return ""
    if t == _FD.TYPE_BYTES:
        return b""
    if t == _FD.TYPE_BOOL:
        return False
    if t in (_FD.TYPE_DOUBLE, _FD.TYPE_FLOAT):
        return 0.0
    return 0


class Message:
    """Base class; concrete subclasses carry a ``DESCRIPTOR``."""

    DESCRIPTOR = None

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for name, value in kwargs.items():
            if value is None:
                continue
            fd = self._field(name)
            self._set_field(fd, value)

    # -- attribute plumbing -------------------------------------------------

    @classmethod
    def _field(cls, name):
        fd = cls.DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise ValueError(
                f"{cls.DESCRIPTOR.full_name} has no field named {name!r}"
            )
        return fd

    def __getattr__(self, name):
        # only called when normal lookup fails -> field names
        try:
            fd = self.DESCRIPTOR.fields_by_name[name]
        except (AttributeError, KeyError):
            raise AttributeError(name) from None
        values = self.__dict__["_values"]
        if fd.is_repeated:
            if name not in values:
                cls = fd.message_type._concrete_class if fd.message_type else None
                values[name] = _RepeatedField(fd, cls)
            return values[name]
        if name in values:
            return values[name]
        if fd.type == _FD.TYPE_MESSAGE:
            # unset singular message: a fresh default instance (reads of
            # nested defaults work; mutations on it are deliberately not
            # tracked, matching how the TWS client uses the API)
            return fd.message_type._concrete_class()
        return _default_scalar(fd)

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        fd = self._field(name)
        if fd.type == _FD.TYPE_MESSAGE and not fd.is_repeated:
            raise AttributeError(
                "assignment not allowed to singular message field "
                f"{name!r} (use the field's CopyFrom or constructor kwargs)"
            )
        self._set_field(fd, value)

    def _set_field(self, fd, value):
        values = self.__dict__["_values"]
        if fd.is_repeated:
            cls = fd.message_type._concrete_class if fd.message_type else None
            lst = _RepeatedField(fd, cls)
            for item in value:
                lst.append(self._coerce(fd, item))
            values[fd.name] = lst
        else:
            values[fd.name] = self._coerce(fd, value)
            if fd.containing_oneof is not None:
                for sibling in fd.containing_oneof.fields:
                    if sibling is not fd:
                        values.pop(sibling.name, None)

    @staticmethod
    def _coerce(fd, value):
        t = fd.type
        if t == _FD.TYPE_MESSAGE:
            cls = fd.message_type._concrete_class
            if isinstance(value, cls):
                return value
            if isinstance(value, dict):
                return cls(**value)
            if isinstance(value, Message) and (
                value.DESCRIPTOR.full_name == fd.message_type.full_name
            ):
                return value
            raise TypeError(
                f"field {fd.name!r} expects {fd.message_type.full_name}, "
                f"got {type(value).__name__}"
            )
        if t == _FD.TYPE_STRING:
            if isinstance(value, bytes):
                return value.decode("utf-8")
            if not isinstance(value, str):
                raise TypeError(f"field {fd.name!r} expects str")
            return value
        if t == _FD.TYPE_BYTES:
            if not isinstance(value, (bytes, bytearray, memoryview)):
                raise TypeError(f"field {fd.name!r} expects bytes")
            return bytes(value)
        if t == _FD.TYPE_BOOL:
            return bool(value)
        if t in (_FD.TYPE_DOUBLE, _FD.TYPE_FLOAT):
            return float(value)
        if t == _FD.TYPE_ENUM and isinstance(value, str):
            return fd.enum_type.values_by_name[value].number
        return int(value)

    # -- protobuf public API ------------------------------------------------

    def HasField(self, name):  # noqa: N802 - protobuf API name
        fd = self._field(name)
        if fd.is_repeated:
            raise ValueError(f"HasField not valid for repeated field {name!r}")
        return name in self.__dict__["_values"]

    def WhichOneof(self, oneof_name):  # noqa: N802
        oneof = self.DESCRIPTOR.oneofs_by_name[oneof_name]
        values = self.__dict__["_values"]
        for fd in oneof.fields:
            if fd.name in values:
                return fd.name
        return None

    def Clear(self):  # noqa: N802
        self.__dict__["_values"].clear()

    def ClearField(self, name):  # noqa: N802
        self._field(name)
        self.__dict__["_values"].pop(name, None)

    def CopyFrom(self, other):  # noqa: N802
        if other.DESCRIPTOR.full_name != self.DESCRIPTOR.full_name:
            raise TypeError("CopyFrom between different message types")
        self.Clear()
        self.MergeFromString(other.SerializeToString())

    def SerializeToString(self, **_kw):  # noqa: N802
        out = bytearray()
        values = self.__dict__["_values"]
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            if fd.name not in values:
                continue
            value = values[fd.name]
            if fd.is_repeated:
                for item in value:
                    out += self._encode_one(fd, item)
            else:
                out += self._encode_one(fd, value)
        return bytes(out)

    @staticmethod
    def _encode_one(fd, value):
        t = fd.type
        num = fd.number
        if t in _VARINT_TYPES:
            return _wire.encode_tag(num, 0) + _wire.encode_varint(int(value))
        if t in _ZIGZAG_TYPES:
            return _wire.encode_tag(num, 0) + _wire.encode_varint(
                _wire.zigzag_encode(int(value))
            )
        if t == _FD.TYPE_STRING:
            return _wire.encode_len_delimited(num, value.encode("utf-8"))
        if t == _FD.TYPE_BYTES:
            return _wire.encode_len_delimited(num, value)
        if t == _FD.TYPE_MESSAGE:
            return _wire.encode_len_delimited(num, value.SerializeToString())
        if t == _FD.TYPE_DOUBLE:
            return _wire.encode_tag(num, 1) + _wire.encode_double(value)
        if t == _FD.TYPE_FLOAT:
            return _wire.encode_tag(num, 5) + _wire.encode_float(value)
        if t in (_FD.TYPE_FIXED64, _FD.TYPE_SFIXED64):
            return _wire.encode_tag(num, 1) + _wire.encode_fixed64(int(value))
        if t in (_FD.TYPE_FIXED32, _FD.TYPE_SFIXED32):
            return _wire.encode_tag(num, 5) + _wire.encode_fixed32(int(value))
        raise EncodeError(f"unsupported field type {t} ({fd.name})")

    def ParseFromString(self, data):  # noqa: N802
        self.Clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data):  # noqa: N802
        try:
            self._merge_wire(bytes(data))
        except ValueError as exc:
            raise DecodeError(str(exc)) from exc
        return len(data)

    def _merge_wire(self, buf):
        desc = self.DESCRIPTOR
        for num, wt, raw in _wire.iter_fields(buf):
            fd = desc.fields_by_number.get(num)
            if fd is None:
                continue  # unknown field: skip (forward compatibility)
            if fd.is_repeated and wt == 2 and fd.type in (
                _VARINT_TYPES | _ZIGZAG_TYPES | _FIXED64_TYPES | _FIXED32_TYPES
            ):
                # packed repeated scalars
                for item in self._decode_packed(fd, raw):
                    getattr(self, fd.name).append(item)
                continue
            value = self._decode_one(fd, wt, raw)
            if fd.is_repeated:
                getattr(self, fd.name).append(value)
            else:
                self.__dict__["_values"][fd.name] = value
                if fd.containing_oneof is not None:
                    for sibling in fd.containing_oneof.fields:
                        if sibling is not fd:
                            self.__dict__["_values"].pop(sibling.name, None)

    @staticmethod
    def _decode_packed(fd, raw):
        t = fd.type
        pos = 0
        out = []
        while pos < len(raw):
            if t in _VARINT_TYPES or t in _ZIGZAG_TYPES:
                v, pos = _wire.decode_varint(raw, pos)
                out.append(Message._scalar_from_varint(fd, v))
            elif t in _FIXED64_TYPES:
                out.append(Message._fixed_value(fd, raw[pos : pos + 8]))
                pos += 8
            else:
                out.append(Message._fixed_value(fd, raw[pos : pos + 4]))
                pos += 4
        return out

    @staticmethod
    def _scalar_from_varint(fd, v):
        t = fd.type
        if t == _FD.TYPE_BOOL:
            return bool(v)
        if t in (_FD.TYPE_UINT32, _FD.TYPE_UINT64):
            return v
        if t in _ZIGZAG_TYPES:
            return _wire.zigzag_decode(v)
        # int32/int64/enum: two's-complement 64-bit
        return _wire.to_signed64(v)

    @staticmethod
    def _fixed_value(fd, raw):
        t = fd.type
        if t == _FD.TYPE_DOUBLE:
            return struct.unpack("<d", raw)[0]
        if t == _FD.TYPE_FLOAT:
            return struct.unpack("<f", raw)[0]
        if t == _FD.TYPE_FIXED64:
            return struct.unpack("<Q", raw)[0]
        if t == _FD.TYPE_SFIXED64:
            return struct.unpack("<q", raw)[0]
        if t == _FD.TYPE_FIXED32:
            return struct.unpack("<I", raw)[0]
        return struct.unpack("<i", raw)[0]

    def _decode_one(self, fd, wt, raw):
        t = fd.type
        if t in _VARINT_TYPES or t in _ZIGZAG_TYPES:
            if wt != 0:
                raise DecodeError(f"field {fd.name}: expected varint, got wt={wt}")
            return self._scalar_from_varint(fd, raw)
        if t == _FD.TYPE_STRING:
            return raw.decode("utf-8")
        if t == _FD.TYPE_BYTES:
            return bytes(raw)
        if t == _FD.TYPE_MESSAGE:
            sub = fd.message_type._concrete_class()
            sub._merge_wire(raw)
            return sub
        if t in _FIXED64_TYPES or t in _FIXED32_TYPES:
            return self._fixed_value(fd, raw)
        raise DecodeError(f"unsupported field type {t} ({fd.name})")

    def ByteSize(self):  # noqa: N802
        return len(self.SerializeToString())

    def IsInitialized(self):  # noqa: N802
        return True

    def ListFields(self):  # noqa: N802
        values = self.__dict__["_values"]
        out = []
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            if fd.name in values:
                v = values[fd.name]
                if fd.is_repeated and not v:
                    continue
                out.append((fd, v))
        return out

    def __eq__(self, other):
        return (
            isinstance(other, Message)
            and other.DESCRIPTOR is self.DESCRIPTOR
            and other.SerializeToString() == self.SerializeToString()
        )

    def __ne__(self, other):
        return not self.__eq__(other)

    def __repr__(self):
        parts = ", ".join(
            f"{fd.name}={v!r}" for fd, v in self.ListFields()
        )
        return f"{self.DESCRIPTOR.full_name}({parts})"

    __str__ = __repr__
