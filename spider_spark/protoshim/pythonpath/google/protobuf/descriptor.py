"""Descriptor objects plus a hand-rolled parser for serialized
``FileDescriptorProto`` blobs (the argument generated ``*_pb2.py``
modules pass to ``descriptor_pool.Default().AddSerializedFile``).

The field numbers of descriptor.proto are public and frozen
(https://protobuf.dev → src/google/protobuf/descriptor.proto):

  FileDescriptorProto: name=1 package=2 dependency=3 message_type=4
    enum_type=5 syntax=12
  DescriptorProto:     name=1 field=2 nested_type=3 enum_type=4
    oneof_decl=8
  FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
    default_value=7 oneof_index=9 json_name=10 proto3_optional=17
  OneofDescriptorProto: name=1
  EnumDescriptorProto:  name=1 value=2
  EnumValueDescriptorProto: name=1 number=2

Only those are consumed; everything else (options, source info,
services, extensions) is skipped as unknown fields.
"""

from __future__ import annotations

from . import _wire

# Generated modules check this to decide between the C and pure-Python
# code paths; this shim is pure Python.
_USE_C_DESCRIPTORS = False


class Error(Exception):
    pass


class _Flexible:
    """Base allowing arbitrary attribute writes: generated modules
    attach bookkeeping like ``_serialized_start`` / ``_loaded_options``
    to descriptors post-construction."""


class FieldDescriptor(_Flexible):
    # Type enum (FieldDescriptorProto.Type — public, frozen)
    TYPE_DOUBLE = 1
    TYPE_FLOAT = 2
    TYPE_INT64 = 3
    TYPE_UINT64 = 4
    TYPE_INT32 = 5
    TYPE_FIXED64 = 6
    TYPE_FIXED32 = 7
    TYPE_BOOL = 8
    TYPE_STRING = 9
    TYPE_GROUP = 10
    TYPE_MESSAGE = 11
    TYPE_BYTES = 12
    TYPE_UINT32 = 13
    TYPE_ENUM = 14
    TYPE_SFIXED32 = 15
    TYPE_SFIXED64 = 16
    TYPE_SINT32 = 17
    TYPE_SINT64 = 18

    LABEL_OPTIONAL = 1
    LABEL_REQUIRED = 2
    LABEL_REPEATED = 3

    def __init__(
        self,
        name,
        number,
        type,  # noqa: A002 - mirrors the public descriptor attribute name
        label,
        type_name="",
        oneof_index=None,
        proto3_optional=False,
        json_name="",
    ):
        self.name = name
        self.number = number
        self.type = type
        self.label = label
        self.type_name = type_name  # fully qualified, leading '.'
        self.oneof_index = oneof_index
        self.proto3_optional = proto3_optional
        self.json_name = json_name or name
        # linked by the pool after all messages are registered:
        self.message_type = None  # Descriptor, for TYPE_MESSAGE
        self.enum_type = None  # EnumDescriptor, for TYPE_ENUM
        self.containing_type = None  # Descriptor
        self.containing_oneof = None  # OneofDescriptor

    @property
    def is_repeated(self):
        return self.label == self.LABEL_REPEATED

    def __repr__(self):
        return f"<FieldDescriptor {self.name}={self.number}>"


class OneofDescriptor(_Flexible):
    def __init__(self, name, index):
        self.name = name
        self.index = index
        self.fields = []
        self.containing_type = None


class EnumValueDescriptor(_Flexible):
    def __init__(self, name, number, index):
        self.name = name
        self.number = number
        self.index = index


class EnumDescriptor(_Flexible):
    def __init__(self, name, full_name, values):
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number = {}
        for v in values:
            # first value wins on aliases, matching protobuf semantics
            self.values_by_number.setdefault(v.number, v)
        self.containing_type = None
        self.file = None

    def __repr__(self):
        return f"<EnumDescriptor {self.full_name}>"


class Descriptor(_Flexible):
    def __init__(self, name, full_name, fields, nested_types, enum_types, oneofs):
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.nested_types = nested_types
        self.nested_types_by_name = {m.name: m for m in nested_types}
        self.enum_types = enum_types
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.oneofs = oneofs
        self.oneofs_by_name = {o.name: o for o in oneofs}
        self.containing_type = None
        self.file = None
        self._concrete_class = None
        for f in fields:
            f.containing_type = self
            if f.oneof_index is not None and 0 <= f.oneof_index < len(oneofs):
                oneof = oneofs[f.oneof_index]
                oneof.fields.append(f)
                f.containing_oneof = oneof
        for o in oneofs:
            o.containing_type = self

    def __repr__(self):
        return f"<Descriptor {self.full_name}>"


class FileDescriptor(_Flexible):
    def __init__(self, name, package, message_types, enum_types, serialized_pb):
        self.name = name
        self.package = package
        self.message_types_by_name = {m.name: m for m in message_types}
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.serialized_pb = serialized_pb
        self.dependencies = []

    def __repr__(self):
        return f"<FileDescriptor {self.name}>"


# ---------------------------------------------------------------------------
# FileDescriptorProto wire parsing
# ---------------------------------------------------------------------------


def _utf8(b):
    return b.decode("utf-8")


def _parse_enum_value(buf):
    name, number = "", 0
    for num, _wt, val in _wire.iter_fields(buf):
        if num == 1:
            name = _utf8(val)
        elif num == 2:
            number = _wire.to_signed64(val)
    return name, number


def _parse_enum(buf, prefix):
    name = ""
    values = []
    for num, _wt, val in _wire.iter_fields(buf):
        if num == 1:
            name = _utf8(val)
        elif num == 2:
            values.append(val)
    value_descs = [
        EnumValueDescriptor(n, v, i)
        for i, (n, v) in enumerate(_parse_enum_value(b) for b in values)
    ]
    return EnumDescriptor(name, f"{prefix}.{name}" if prefix else name, value_descs)


def _parse_field(buf):
    kwargs = dict(name="", number=0, type=0, label=1)
    oneof_index = None
    proto3_optional = False
    type_name = ""
    json_name = ""
    for num, _wt, val in _wire.iter_fields(buf):
        if num == 1:
            kwargs["name"] = _utf8(val)
        elif num == 3:
            kwargs["number"] = _wire.to_signed64(val)
        elif num == 4:
            kwargs["label"] = val
        elif num == 5:
            kwargs["type"] = val
        elif num == 6:
            type_name = _utf8(val)
        elif num == 9:
            oneof_index = _wire.to_signed64(val)
        elif num == 10:
            json_name = _utf8(val)
        elif num == 17:
            proto3_optional = bool(val)
    return FieldDescriptor(
        type_name=type_name,
        oneof_index=oneof_index,
        proto3_optional=proto3_optional,
        json_name=json_name,
        **kwargs,
    )


def _parse_message(buf, prefix):
    name = ""
    field_bufs, nested_bufs, enum_bufs, oneof_bufs = [], [], [], []
    for num, _wt, val in _wire.iter_fields(buf):
        if num == 1:
            name = _utf8(val)
        elif num == 2:
            field_bufs.append(val)
        elif num == 3:
            nested_bufs.append(val)
        elif num == 4:
            enum_bufs.append(val)
        elif num == 8:
            oneof_bufs.append(val)
    full_name = f"{prefix}.{name}" if prefix else name
    fields = [_parse_field(b) for b in field_bufs]
    nested = [_parse_message(b, full_name) for b in nested_bufs]
    enums = [_parse_enum(b, full_name) for b in enum_bufs]
    oneofs = []
    for i, b in enumerate(oneof_bufs):
        oname = ""
        for onum, _owt, oval in _wire.iter_fields(b):
            if onum == 1:
                oname = _utf8(oval)
        oneofs.append(OneofDescriptor(oname, i))
    return Descriptor(name, full_name, fields, nested, enums, oneofs)


def parse_file_descriptor(serialized_pb: bytes) -> FileDescriptor:
    name, package = "", ""
    message_bufs, enum_bufs = [], []
    for num, _wt, val in _wire.iter_fields(serialized_pb):
        if num == 1:
            name = _utf8(val)
        elif num == 2:
            package = _utf8(val)
        elif num == 4:
            message_bufs.append(val)
        elif num == 5:
            enum_bufs.append(val)
    messages = [_parse_message(b, package) for b in message_bufs]
    enums = [_parse_enum(b, package) for b in enum_bufs]
    fd = FileDescriptor(name, package, messages, enums, serialized_pb)

    def _stamp(msg):
        msg.file = fd
        for nt in msg.nested_types:
            nt.containing_type = msg
            _stamp(nt)
        for et in msg.enum_types:
            et.containing_type = msg
            et.file = fd

    for m in messages:
        _stamp(m)
    for e in enums:
        e.file = fd
    return fd
