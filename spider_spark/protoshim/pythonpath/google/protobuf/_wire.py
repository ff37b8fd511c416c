"""Protobuf wire-format primitives (public spec:
https://protobuf.dev/programming-guides/encoding/).

Wire types: 0 = varint, 1 = 64-bit little-endian, 2 = length-delimited,
5 = 32-bit little-endian. A tag is ``(field_number << 3) | wire_type``
as a varint. Signed int32/int64 values travel as 64-bit two's-complement
varints; sint* use zigzag.
"""

from __future__ import annotations

import struct

_MASK64 = (1 << 64) - 1


def encode_varint(value: int) -> bytes:
    value &= _MASK64
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos). Value is the raw unsigned varint."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result & _MASK64, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def to_signed64(value: int) -> int:
    """Two's-complement interpretation of a raw unsigned varint."""
    return value - (1 << 64) if value >= (1 << 63) else value


def zigzag_encode(value: int) -> int:
    return ((value << 1) ^ (value >> 63)) & _MASK64


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def encode_tag(field_number: int, wire_type: int) -> bytes:
    return encode_varint((field_number << 3) | wire_type)


def encode_len_delimited(field_number: int, payload: bytes) -> bytes:
    return encode_tag(field_number, 2) + encode_varint(len(payload)) + payload


def encode_fixed64(value: int) -> bytes:
    return struct.pack("<Q", value & _MASK64)


def encode_fixed32(value: int) -> bytes:
    return struct.pack("<I", value & 0xFFFFFFFF)


def encode_double(value: float) -> bytes:
    return struct.pack("<d", value)


def encode_float(value: float) -> bytes:
    return struct.pack("<f", value)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) for each field in *buf*.

    Varint fields yield the raw unsigned int; 64-bit and 32-bit fields
    yield the raw bytes (8 / 4); length-delimited fields yield the
    payload bytes. Groups (wire types 3/4) are skipped recursively —
    they cannot appear in proto3 output but a correct skipper costs
    nothing.
    """
    pos = 0
    end = len(buf)
    while pos < end:
        key, pos = decode_varint(buf, pos)
        field_number = key >> 3
        wire_type = key & 7
        if wire_type == 0:
            value, pos = decode_varint(buf, pos)
        elif wire_type == 1:
            value, pos = buf[pos : pos + 8], pos + 8
            if len(value) != 8:
                raise ValueError("truncated fixed64")
        elif wire_type == 2:
            length, pos = decode_varint(buf, pos)
            value, pos = buf[pos : pos + length], pos + length
            if len(value) != length:
                raise ValueError("truncated length-delimited field")
        elif wire_type == 5:
            value, pos = buf[pos : pos + 4], pos + 4
            if len(value) != 4:
                raise ValueError("truncated fixed32")
        elif wire_type == 3:  # start group: skip to matching end group
            depth = 1
            value = None
            while depth:
                k2, pos = decode_varint(buf, pos)
                wt2 = k2 & 7
                if wt2 == 3:
                    depth += 1
                elif wt2 == 4:
                    depth -= 1
                elif wt2 == 0:
                    _, pos = decode_varint(buf, pos)
                elif wt2 == 1:
                    pos += 8
                elif wt2 == 2:
                    ln, pos = decode_varint(buf, pos)
                    pos += ln
                else:
                    raise ValueError(f"bad wire type {wt2} in group")
            continue
        elif wire_type == 4:
            raise ValueError("end group without start group")
        else:
            raise ValueError(f"bad wire type {wire_type}")
        yield field_number, wire_type, value
