"""Runtime/gencode version gate. Generated modules call
``ValidateProtobufRuntimeVersion`` defensively; this shim accepts any
gencode version — its message runtime implements the frozen proto3 wire
format, which is version-independent."""

from __future__ import annotations


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(  # noqa: N802
    domain, major, minor, patch, suffix, location
):
    # Intentionally a no-op: see module docstring.
    return None
