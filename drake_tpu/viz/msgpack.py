"""Minimal msgpack codec (no third-party deps) for the meshcat protocol.

Implements the msgpack spec subset the meshcat wire format uses
(https://github.com/msgpack/msgpack/blob/master/spec.md): nil/bool/ints/
float32/float64/str/bin/array/map/ext, plus the meshcat "typed array"
convention used by three.js BufferGeometry attributes (reference:
geometry/meshcat_types_internal.h:560-615 Eigen adaptor — a map
{itemSize, type, array: ext(0x17|0x12|0x16, raw bytes), normalized: false}).

A decoder is included for round-trip testing.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Any

import numpy as np

# meshcat/three.js typed-array msgpack ext codes (meshcat-python
# geometry.py pack_numpy_array convention, mirrored by the reference's
# Eigen adaptor).
EXT_FLOAT32 = 0x17
EXT_UINT8 = 0x12
EXT_UINT32 = 0x16

_EXT_FOR_DTYPE = {
    np.dtype(np.float32): (EXT_FLOAT32, "Float32Array"),
    np.dtype(np.uint8): (EXT_UINT8, "Uint8Array"),
    np.dtype(np.uint32): (EXT_UINT32, "Uint32Array"),
}


@dataclasses.dataclass(frozen=True)
class Ext:
    """A raw msgpack extension value."""

    code: int
    data: bytes


class TypedArray:
    """A three.js BufferGeometry attribute: encodes as the meshcat
    {itemSize, type, array, normalized} map with an ext-packed body.

    ``mat``: (itemSize, n) array — column-major layout matches the
    reference's Eigen::Matrix3Xf semantics (itemSize = rows).
    """

    def __init__(self, mat: np.ndarray):
        mat = np.asarray(mat)
        if mat.ndim != 2:
            raise ValueError("TypedArray expects a 2-D (itemSize, n) array")
        if mat.dtype not in _EXT_FOR_DTYPE:
            if np.issubdtype(mat.dtype, np.floating):
                mat = mat.astype(np.float32)
            elif np.issubdtype(mat.dtype, np.integer):
                mat = mat.astype(np.uint32)
            else:
                raise ValueError(f"unsupported dtype {mat.dtype}")
        self.mat = mat

    def to_obj(self):
        code, js_type = _EXT_FOR_DTYPE[self.mat.dtype]
        # Column-major (Fortran) byte order: element i of column j adjacent,
        # matching Eigen's default storage that the viewer expects.
        body = np.asfortranarray(self.mat).tobytes(order="F")
        return {
            "itemSize": self.mat.shape[0],
            "type": js_type,
            "array": Ext(code, body),
            "normalized": False,
        }


def _pack_int(n: int, out: bytearray):
    if 0 <= n <= 0x7F:
        out.append(n)
    elif -32 <= n < 0:
        out.append(0x100 + n)
    elif 0 <= n <= 0xFF:
        out += b"\xcc" + n.to_bytes(1, "big")
    elif 0 <= n <= 0xFFFF:
        out += b"\xcd" + n.to_bytes(2, "big")
    elif 0 <= n <= 0xFFFFFFFF:
        out += b"\xce" + n.to_bytes(4, "big")
    elif 0 <= n:
        out += b"\xcf" + n.to_bytes(8, "big")
    elif n >= -(1 << 7):
        out += b"\xd0" + n.to_bytes(1, "big", signed=True)
    elif n >= -(1 << 15):
        out += b"\xd1" + n.to_bytes(2, "big", signed=True)
    elif n >= -(1 << 31):
        out += b"\xd2" + n.to_bytes(4, "big", signed=True)
    else:
        out += b"\xd3" + n.to_bytes(8, "big", signed=True)


def _pack_ext(code: int, data: bytes, out: bytearray):
    n = len(data)
    if n == 1:
        out.append(0xD4)
    elif n == 2:
        out.append(0xD5)
    elif n == 4:
        out.append(0xD6)
    elif n == 8:
        out.append(0xD7)
    elif n == 16:
        out.append(0xD8)
    elif n <= 0xFF:
        out += b"\xc7" + n.to_bytes(1, "big")
    elif n <= 0xFFFF:
        out += b"\xc8" + n.to_bytes(2, "big")
    else:
        out += b"\xc9" + n.to_bytes(4, "big")
    out.append(code & 0xFF)
    out += data


def _pack(obj: Any, out: bytearray):
    if obj is None:
        out.append(0xC0)
    elif obj is False:
        out.append(0xC2)
    elif obj is True:
        out.append(0xC3)
    elif isinstance(obj, (int, np.integer)):
        _pack_int(int(obj), out)
    elif isinstance(obj, (float, np.floating)):
        out += b"\xcb" + struct.pack(">d", float(obj))
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += b"\xd9" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xda" + n.to_bytes(2, "big")
        else:
            out += b"\xdb" + n.to_bytes(4, "big")
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += b"\xc4" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xc5" + n.to_bytes(2, "big")
        else:
            out += b"\xc6" + n.to_bytes(4, "big")
        out += bytes(obj)
    elif isinstance(obj, Ext):
        _pack_ext(obj.code, obj.data, out)
    elif isinstance(obj, TypedArray):
        _pack(obj.to_obj(), out)
    elif isinstance(obj, np.ndarray):
        _pack(obj.tolist(), out)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + n.to_bytes(2, "big")
        else:
            out += b"\xdd" + n.to_bytes(4, "big")
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + n.to_bytes(2, "big")
        else:
            out += b"\xdf" + n.to_bytes(4, "big")
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj)}")


def packb(obj: Any) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


# --------------------------- decoder (for tests) ---------------------------


def _unpack(b: bytes, i: int):
    t = b[i]
    i += 1
    if t <= 0x7F:
        return t, i
    if t >= 0xE0:
        return t - 0x100, i
    if 0x80 <= t <= 0x8F:
        return _unpack_map(b, i, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _unpack_array(b, i, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return b[i : i + n].decode("utf-8"), i + n
    if t == 0xC0:
        return None, i
    if t == 0xC2:
        return False, i
    if t == 0xC3:
        return True, i
    if t in (0xC4, 0xC5, 0xC6):
        ln = {0xC4: 1, 0xC5: 2, 0xC6: 4}[t]
        n = int.from_bytes(b[i : i + ln], "big")
        i += ln
        return bytes(b[i : i + n]), i + n
    if t in (0xC7, 0xC8, 0xC9):
        ln = {0xC7: 1, 0xC8: 2, 0xC9: 4}[t]
        n = int.from_bytes(b[i : i + ln], "big")
        i += ln
        code = b[i]
        i += 1
        return Ext(code, bytes(b[i : i + n])), i + n
    if t == 0xCA:
        return struct.unpack(">f", b[i : i + 4])[0], i + 4
    if t == 0xCB:
        return struct.unpack(">d", b[i : i + 8])[0], i + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):
        ln = {0xCC: 1, 0xCD: 2, 0xCE: 4, 0xCF: 8}[t]
        return int.from_bytes(b[i : i + ln], "big"), i + ln
    if t in (0xD0, 0xD1, 0xD2, 0xD3):
        ln = {0xD0: 1, 0xD1: 2, 0xD2: 4, 0xD3: 8}[t]
        return int.from_bytes(b[i : i + ln], "big", signed=True), i + ln
    if t in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):
        n = {0xD4: 1, 0xD5: 2, 0xD6: 4, 0xD7: 8, 0xD8: 16}[t]
        code = b[i]
        i += 1
        return Ext(code, bytes(b[i : i + n])), i + n
    if t in (0xD9, 0xDA, 0xDB):
        ln = {0xD9: 1, 0xDA: 2, 0xDB: 4}[t]
        n = int.from_bytes(b[i : i + ln], "big")
        i += ln
        return b[i : i + n].decode("utf-8"), i + n
    if t in (0xDC, 0xDD):
        ln = {0xDC: 2, 0xDD: 4}[t]
        n = int.from_bytes(b[i : i + ln], "big")
        return _unpack_array(b, i + ln, n)
    if t in (0xDE, 0xDF):
        ln = {0xDE: 2, 0xDF: 4}[t]
        n = int.from_bytes(b[i : i + ln], "big")
        return _unpack_map(b, i + ln, n)
    raise ValueError(f"bad msgpack byte 0x{t:02x}")


def _unpack_array(b, i, n):
    out = []
    for _ in range(n):
        v, i = _unpack(b, i)
        out.append(v)
    return out, i


def _unpack_map(b, i, n):
    out = {}
    for _ in range(n):
        k, i = _unpack(b, i)
        v, i = _unpack(b, i)
        out[k] = v
    return out, i


def unpackb(b: bytes) -> Any:
    v, i = _unpack(b, 0)
    if i != len(b):
        raise ValueError(f"trailing bytes: {len(b) - i}")
    return v
