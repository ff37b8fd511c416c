"""Enum wrapper exposing values as attributes plus Name()/Value()
lookups — the object generated modules bind under the enum's name."""

from __future__ import annotations


class EnumTypeWrapper:
    def __init__(self, enum_descriptor):
        self.DESCRIPTOR = enum_descriptor
        for value in enum_descriptor.values:
            setattr(self, value.name, value.number)

    def Name(self, number):  # noqa: N802
        return self.DESCRIPTOR.values_by_number[number].name

    def Value(self, name):  # noqa: N802
        return self.DESCRIPTOR.values_by_name[name].number

    def keys(self):
        return [v.name for v in self.DESCRIPTOR.values]

    def values(self):
        return [v.number for v in self.DESCRIPTOR.values]

    def items(self):
        return [(v.name, v.number) for v in self.DESCRIPTOR.values]
