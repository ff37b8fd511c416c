"""Descriptor pool: registers serialized FileDescriptorProtos and links
message-typed / enum-typed fields to their target descriptors by fully
qualified name."""

from __future__ import annotations

from . import descriptor as _descriptor


class DescriptorPool:
    def __init__(self):
        self._files_by_name = {}
        self._messages = {}  # full_name -> Descriptor
        self._enums = {}  # full_name -> EnumDescriptor

    def AddSerializedFile(self, serialized_pb):  # noqa: N802
        fd = _descriptor.parse_file_descriptor(bytes(serialized_pb))
        existing = self._files_by_name.get(fd.name)
        if existing is not None:
            return existing
        self._files_by_name[fd.name] = fd

        def _register(msg):
            self._messages[msg.full_name] = msg
            for nt in msg.nested_types:
                _register(nt)
            for et in msg.enum_types:
                self._enums[et.full_name] = et

        for m in fd.message_types_by_name.values():
            _register(m)
        for e in fd.enum_types_by_name.values():
            self._enums[e.full_name] = e

        # second pass: resolve field type references (same-file or any
        # previously registered file)
        def _link(msg):
            for f in msg.fields:
                if f.type_name:
                    target = f.type_name.lstrip(".")
                    if f.type == _descriptor.FieldDescriptor.TYPE_MESSAGE:
                        f.message_type = self._messages[target]
                    elif f.type == _descriptor.FieldDescriptor.TYPE_ENUM:
                        f.enum_type = self._enums[target]
            for nt in msg.nested_types:
                _link(nt)

        for m in fd.message_types_by_name.values():
            _link(m)
        return fd

    def FindMessageTypeByName(self, full_name):  # noqa: N802
        return self._messages[full_name]

    def FindEnumTypeByName(self, full_name):  # noqa: N802
        return self._enums[full_name]

    def FindFileByName(self, name):  # noqa: N802
        return self._files_by_name[name]


_DEFAULT = DescriptorPool()


def Default():  # noqa: N802
    return _DEFAULT
