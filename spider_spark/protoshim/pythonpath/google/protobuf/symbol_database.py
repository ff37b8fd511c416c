"""Symbol database: maps registered message full names to their
generated classes. Generated modules grab the default instance; the TWS
client itself never queries it, so the surface is minimal."""

from __future__ import annotations

from . import descriptor_pool as _descriptor_pool


class SymbolDatabase:
    def __init__(self, pool=None):
        self.pool = pool or _descriptor_pool.Default()
        self._classes = {}  # full_name -> class

    def RegisterMessage(self, cls):  # noqa: N802
        self._classes[cls.DESCRIPTOR.full_name] = cls
        return cls

    def GetSymbol(self, full_name):  # noqa: N802
        return self._classes[full_name]


_DEFAULT = SymbolDatabase()


def Default():  # noqa: N802
    return _DEFAULT
