"""LZ4 raw-block codec for MET_TYPE 8 binary met containers.

The reference wraps each 3-D field payload in LZ4_compress_default /
LZ4_decompress_safe blocks (compress_lz4,
/root/reference/src/mptrac.c:1740-1857; framing: size_t length then
the block).  Here the codec lives in the native library
(native/lz4codec.cc, ctypes-bound); a pure-Python decoder serves as
fallback when the library can't be built.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _native():
    from mptrac_tpu.native_loader import get_library
    lib = get_library()
    if lib is None or not hasattr(lib, "mt_lz4_compress"):
        return None
    lib.mt_lz4_bound.restype = ctypes.c_size_t
    lib.mt_lz4_bound.argtypes = [ctypes.c_size_t]
    lib.mt_lz4_compress.restype = ctypes.c_size_t
    lib.mt_lz4_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        np.ctypeslib.ndpointer(np.uint8)]
    lib.mt_lz4_decompress.restype = ctypes.c_size_t
    lib.mt_lz4_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        np.ctypeslib.ndpointer(np.uint8), ctypes.c_size_t]
    return lib


def compress(data: bytes) -> bytes:
    lib = _native()
    if lib is not None:
        out = np.empty(int(lib.mt_lz4_bound(len(data))), np.uint8)
        n = lib.mt_lz4_compress(data, len(data), out)
        if n == 0 and len(data):
            raise IOError("LZ4 compression failed!")
        return out[:n].tobytes()
    return _compress_py(data)


def decompress(data: bytes, dlen: int) -> bytes:
    lib = _native()
    if lib is not None:
        out = np.empty(dlen, np.uint8)
        n = lib.mt_lz4_decompress(data, len(data), out, dlen)
        if n != dlen:
            raise IOError("LZ4 decompression failed or size mismatch!")
        return out.tobytes()
    return _decompress_py(data, dlen)


def _compress_py(data: bytes) -> bytes:
    """Literal-only LZ4 stream (valid but uncompressed) — fallback
    when the native codec is unavailable."""
    out = bytearray()
    n = len(data)
    if n >= 15:
        out.append(15 << 4)
        rem = n - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    else:
        out.append(n << 4)
    out += data
    return bytes(out)


def _decompress_py(data: bytes, dlen: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        token = data[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                b = data[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        out += data[i:i + litlen]
        i += litlen
        if i >= n:
            break
        offset = data[i] | (data[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise IOError("LZ4 stream corrupt!")
        mlen = token & 15
        if mlen == 15:
            while True:
                b = data[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        for _ in range(mlen):          # overlapping copies are legal
            out.append(out[-offset])
    if len(out) != dlen:
        raise IOError("LZ4 decompressed size mismatch!")
    return bytes(out)
