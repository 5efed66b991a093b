"""MPTRAC binary met container (version 104).

Reference: read_met_bin (/root/reference/src/mptrac.c:8563-8862),
write_met_bin (c:13670-13922), compress_pck (c:986-1261, per-level
16-bit scale/offset quantization with optional outer ZSTD),
compress_zstd (c:1624-1740).

Supported met_type codecs: 1 = raw float, 2 = PCK (+MET_PCK_ZSTD outer
zstd), 4 = ZSTD of the raw float stream, 8 = LZ4 raw blocks
(compress_lz4 c:1740, native codec in native/lz4codec.cc),
3 = ZFP-style block transform, 5 = CMS-style multiscale and
7 = SZ3-style predict+quantize lossy codecs (met.lossy — the
reference's external-library slots rebuilt as self-contained
vectorized formats, compress_zfp c:1447 / compress_cms c:468 /
compress_sz3 c:1261).  Layout of 3-D
payloads is [ixy, iz] (level-fastest), matching the reference's ARRAY
layout.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.types import MET_2D_FIELDS, MET_3D_FIELDS, Met

PCK_ZSTD_MAGIC = 0x50434B5A53544431

#: optional codecs absent from this build (reference c:7881-7904)
_UNSUPPORTED = {}


def _check_codec(met_type: int) -> None:
    if met_type in _UNSUPPORTED:
        raise NotImplementedError(
            f"MPTRAC was built without {_UNSUPPORTED[met_type]} "
            "compression!")


def _log_codec(name: str, codec: str, n_values: int, comp_len: int,
               verbose: bool) -> None:
    """Compression diagnostics (reference COMPRESS_RATIO/BPV logging,
    mptrac.h:561-585): ratio vs float32 payload and bits per value."""
    if verbose:
        raw = 4 * n_values
        print(f"Write 3-D variable: {name} ({codec}, "
              f"RATIO={raw / max(comp_len, 1):g}, "
              f"BPV={8 * comp_len / max(n_values, 1):g})")

#: 2-D field write order (reference c:8666-8689)
BIN_2D = ("ps", "ts", "zs", "us", "vs", "ess", "nss", "shf", "lsm",
          "sst", "pbl", "pt", "tt", "zt", "h2ot", "pct", "pcb", "cl",
          "plcl", "plfc", "pel", "cape", "cin", "o3c")
#: 3-D field write order with clamping bounds (reference c:8692-8706)
BIN_3D = (("z", -1e34, 1e34), ("t", 0, 1e34), ("u", -1e34, 1e34),
          ("v", -1e34, 1e34), ("w", -1e34, 1e34), ("pv", -1e34, 1e34),
          ("h2o", 0, 1e34), ("o3", 0, 1e34), ("lwc", 0, 1e34),
          ("rwc", 0, 1e34), ("iwc", 0, 1e34), ("swc", 0, 1e34),
          ("cc", 0, 1))


def _pck_compress(arr: np.ndarray, use_zstd: bool, level: int = -3
                  ) -> bytes:
    """arr: [nxy, nz] float32 -> PCK payload."""
    nxy, nz = arr.shape
    vmin = arr.min(axis=0).astype(np.float64)
    vmax = arr.max(axis=0).astype(np.float64)
    scl = (vmax - vmin) / 65533.0
    off = vmin
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(scl != 0,
                     ((arr - off) / np.where(scl != 0, scl, 1)
                      + 0.5).astype(np.uint16), 0)
    payload = scl.tobytes() + off.tobytes() + s.astype("<u2").tobytes()
    if use_zstd:
        import zstandard
        comp = zstandard.ZstdCompressor(level=level).compress(payload)
        return (struct.pack("<Q", PCK_ZSTD_MAGIC)
                + struct.pack("<Q", len(comp)) + comp)
    return payload


def _pck_decompress(f, nxy: int, nz: int, use_zstd: bool) -> np.ndarray:
    if use_zstd:
        magic, = struct.unpack("<Q", f.read(8))
        if magic != PCK_ZSTD_MAGIC:
            raise ValueError("PCK+ZSTD magic mismatch!")
        stored_len, = struct.unpack("<Q", f.read(8))
        import zstandard
        payload = zstandard.ZstdDecompressor().decompress(
            f.read(stored_len), max_output_size=16 * nz + 2 * nxy * nz + 64)
    else:
        payload = f.read(16 * nz + 2 * nxy * nz)
    scl = np.frombuffer(payload[:8 * nz], "<f8")
    off = np.frombuffer(payload[8 * nz:16 * nz], "<f8")
    s = np.frombuffer(payload[16 * nz:16 * nz + 2 * nxy * nz],
                      "<u2").reshape(nxy, nz)
    return (s * scl + off).astype(np.float32)


def write_met_bin(filename: str, met: Met, met_type: int = 1,
                  pck_zstd: bool = False, zstd_level: int = -3,
                  verbose: bool = False, ctl=None) -> None:
    """``ctl`` supplies the per-variable lossy codec settings for
    met_type 5/7 (defaults used when omitted)."""
    _check_codec(met_type)
    ctl_codec = ctl
    if ctl_codec is None and met_type in (3, 5, 7):
        from mptrac_tpu.config import read_ctl
        ctl_codec = read_ctl(None, ["MET_TYPE", str(met_type),
                                    "METBASE", "-"])
    nx, ny, npl = met.nx, met.ny, met.npl
    with open(filename, "wb") as f:
        f.write(struct.pack("<ii", met_type, 104))
        f.write(struct.pack("<d", float(met.time)))
        f.write(struct.pack("<iii", nx, ny, npl))
        np.asarray(met.lon, "<f8").tofile(f)
        np.asarray(met.lat, "<f8").tofile(f)
        np.asarray(met.p, "<f8").tofile(f)
        for name in BIN_2D:
            np.asarray(met.fields2d[name], "<f4").tofile(f)
        for name, lo, hi in BIN_3D:
            arr = np.clip(np.asarray(met.fields3d[name], np.float32),
                          lo, hi)
            flat = arr.reshape(nx * ny, npl)
            if met_type == 1:
                flat.astype("<f4").tofile(f)
            elif met_type == 2:
                payload = _pck_compress(flat, pck_zstd, zstd_level)
                _log_codec(name, "PCK", flat.size, len(payload),
                           verbose)
                f.write(payload)
            elif met_type == 4:
                import zstandard
                comp = zstandard.ZstdCompressor(
                    level=zstd_level).compress(flat.astype("<f4").tobytes())
                _log_codec(name, "ZSTD", flat.size, len(comp), verbose)
                f.write(struct.pack("<Q", len(comp)))
                f.write(comp)
            elif met_type == 8:
                from mptrac_tpu.met import lz4
                comp = lz4.compress(flat.astype("<f4").tobytes())
                _log_codec(name, "LZ4", flat.size, len(comp), verbose)
                f.write(struct.pack("<Q", len(comp)))
                f.write(comp)
            elif met_type == 7:
                from mptrac_tpu.met import lossy
                payload = lossy.sqz_compress(ctl_codec, name, flat,
                                             nx, ny)
                _log_codec(name, "SQZ", flat.size, len(payload),
                           verbose)
                f.write(payload)
            elif met_type == 5:
                from mptrac_tpu.met import lossy
                payload = lossy.cms_compress(ctl_codec, name, flat,
                                             nx, ny)
                _log_codec(name, "CMS", flat.size, len(payload),
                           verbose)
                f.write(payload)
            elif met_type == 3:
                from mptrac_tpu.met import lossy
                payload = lossy.zfp_compress(ctl_codec, name, flat,
                                             nx, ny)
                _log_codec(name, "ZFP", flat.size, len(payload),
                           verbose)
                f.write(payload)
            else:
                raise NotImplementedError(f"MET_TYPE {met_type}")
        f.write(struct.pack("<i", 999))


def read_met_bin(filename: str, ctl) -> Dict[str, object]:
    """Read into the raw dict form used by met.build."""
    met_type = ctl.met_type
    _check_codec(met_type)
    with open(filename, "rb") as f:
        ftype, version = struct.unpack("<ii", f.read(8))
        if ftype != met_type:
            raise ValueError("Wrong MET_TYPE of binary data!")
        if version != 104:
            raise ValueError("Wrong version of binary data!")
        time, = struct.unpack("<d", f.read(8))
        nx, ny, npl = struct.unpack("<iii", f.read(12))
        lon = np.fromfile(f, "<f8", nx)
        lat = np.fromfile(f, "<f8", ny)
        p = np.fromfile(f, "<f8", npl)
        f2 = {}
        for name in BIN_2D:
            f2[name] = np.fromfile(f, "<f4", nx * ny).reshape(nx, ny)
        f3 = {}
        for name, lo, hi in BIN_3D:
            if met_type == 1:
                flat = np.fromfile(f, "<f4", nx * ny * npl).reshape(
                    nx * ny, npl)
            elif met_type == 2:
                flat = _pck_decompress(f, nx * ny, npl,
                                       bool(ctl.met_pck_zstd))
            elif met_type == 4:
                import zstandard
                clen, = struct.unpack("<Q", f.read(8))
                raw = zstandard.ZstdDecompressor().decompress(
                    f.read(clen), max_output_size=4 * nx * ny * npl)
                flat = np.frombuffer(raw, "<f4").reshape(nx * ny, npl)
            elif met_type == 8:
                from mptrac_tpu.met import lz4
                clen, = struct.unpack("<Q", f.read(8))
                raw = lz4.decompress(f.read(clen), 4 * nx * ny * npl)
                flat = np.frombuffer(raw, "<f4").reshape(nx * ny, npl)
            elif met_type == 7:
                from mptrac_tpu.met import lossy
                flat = lossy.sqz_decompress(f, nx, ny, npl)
            elif met_type == 5:
                from mptrac_tpu.met import lossy
                flat = lossy.cms_decompress(f, nx, ny, npl)
            elif met_type == 3:
                from mptrac_tpu.met import lossy
                flat = lossy.zfp_decompress(f, nx, ny, npl)
            else:
                raise NotImplementedError(f"MET_TYPE {met_type}")
            f3[name] = np.clip(flat.reshape(nx, ny, npl), lo, hi)
        final, = struct.unpack("<i", f.read(4))
        if final != 999:
            raise ValueError("Error while reading binary data!")
    for name in MET_2D_FIELDS:
        f2.setdefault(name, np.full((nx, ny), np.nan, np.float32))
    for name in MET_3D_FIELDS:
        f3.setdefault(name, np.zeros((nx, ny, npl), np.float32))
    return dict(time=time, lon=lon, lat=lat, p=p,
                hybrid=np.zeros(npl), fields2d=f2, fields3d=f3,
                coord_type=ctl.met_coord_type, npl_ml=0)
