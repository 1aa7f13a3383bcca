"""ctypes bindings for the native ingest library (cpp/rtnr_ingest.cpp).

Fast paths: binary PLY parsing and the reference-compatible ``.oct`` voxel
cache (bit-identical layout to reference Octreegrid.h:53-114 — caches
written by the reference renderer load here directly, and vice versa).

Falls back cleanly: ``available()`` is False when the .so hasn't been built
(run cpp/build.sh), and callers use the pure-python readers instead.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = Path(__file__).parent / "_rtnr_ingest.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ply_probe.restype = ctypes.c_int
    lib.ply_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong)]
    lib.ply_read.restype = ctypes.c_int
    lib.ply_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.oct_probe.restype = ctypes.c_int
    lib.oct_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong)]
    lib.oct_read.restype = ctypes.c_int
    lib.oct_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.oct_write.restype = ctypes.c_int
    lib.oct_write.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    if hasattr(lib, "e57_open"):  # absent in pre-E57 builds of the .so
        lib.e57_open.restype = ctypes.c_void_p
        lib.e57_open.argtypes = [ctypes.c_char_p]
        lib.e57_close.restype = None
        lib.e57_close.argtypes = [ctypes.c_void_p]
        lib.e57_meta.restype = ctypes.c_char_p
        lib.e57_meta.argtypes = [ctypes.c_void_p]
        lib.e57_last_error.restype = ctypes.c_char_p
        lib.e57_last_error.argtypes = []
        lib.e57_read_field_f64.restype = ctypes.c_int
        lib.e57_read_field_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
        ]
        lib.e57_read_blob.restype = ctypes.c_int
        lib.e57_read_blob.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build(force: bool = False) -> bool:
    """Compile the native library with g++ (one translation unit)."""
    if _LIB_PATH.exists() and not force:
        return True
    import subprocess

    cpp_dir = Path(__file__).resolve().parents[2] / "cpp"
    srcs = [cpp_dir / "rtnr_ingest.cpp", cpp_dir / "rtnr_e57.cpp"]
    if not all(s.exists() for s in srcs):
        return False
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", str(_LIB_PATH)] + [
        str(s) for s in srcs
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _load() is not None


class NativeE57:
    """Handle-owning wrapper over the native E57 container reader
    (cpp/rtnr_e57.cpp). ``meta`` is the parsed JSON description; field reads
    return float64 arrays (libE57 doConversion=true semantics, which the
    reference relies on — PointCloudReader.cpp:116-294)."""

    def __init__(self, path):
        lib = _load()
        if lib is None or not hasattr(lib, "e57_open"):
            raise RuntimeError("native ingest library not built (run cpp/build.sh)")
        self._lib = lib
        self._h = lib.e57_open(str(path).encode())
        if not self._h:
            raise ValueError(
                f"cannot open E57 file {path}: {lib.e57_last_error().decode()}"
            )
        import json

        self.meta = json.loads(lib.e57_meta(self._h).decode())

    def close(self) -> None:
        if self._h:
            self._lib.e57_close(self._h)
            self._h = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def scan_count(self) -> int:
        return len(self.meta["scans"])

    @property
    def image_count(self) -> int:
        return len(self.meta["images"])

    def read_field(self, scan: int, field: str) -> np.ndarray:
        n = int(self.meta["scans"][scan]["record_count"])
        out = np.empty(n, np.float64)
        rc = self._lib.e57_read_field_f64(
            self._h, scan, field.encode(), out.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise ValueError(
                f"E57 field read failed (scan {scan}, field {field}, rc={rc}): "
                f"{self._lib.e57_last_error().decode()}"
            )
        return out

    def read_blob(self, image: int) -> bytes:
        n = int(self.meta["images"][image]["blob_length"])
        out = np.empty(n, np.uint8)
        rc = self._lib.e57_read_blob(self._h, image, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise ValueError(f"E57 blob read failed (image {image}, rc={rc})")
        return out.tobytes()


def read_ply_native(path) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Native binary-PLY read; None -> caller should use the python reader."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_longlong * 2)()
    if lib.ply_probe(str(path).encode(), out) != 0:
        return None
    n, has_color = int(out[0]), bool(out[1])
    pts = np.empty((n, 3), np.float32)
    cols = np.empty((n, 3), np.uint8) if has_color else None
    rc = lib.ply_read(
        str(path).encode(),
        pts.ctypes.data_as(ctypes.c_void_p),
        cols.ctypes.data_as(ctypes.c_void_p) if cols is not None else None,
    )
    if rc != 0:
        return None
    return pts, cols


def read_oct(path) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int, int]]]:
    """Read a reference-format .oct cache: (points, colors, keys, (nx,ny,nz))."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_longlong * 5)()
    if lib.oct_probe(str(path).encode(), out) != 0:
        return None
    n, _nb, nx, ny, nz = (int(v) for v in out)
    pts = np.empty((n, 3), np.float32)
    cols = np.empty((n, 3), np.uint8)
    keys = np.empty((n,), np.int32)
    rc = lib.oct_read(
        str(path).encode(),
        pts.ctypes.data_as(ctypes.c_void_p),
        cols.ctypes.data_as(ctypes.c_void_p),
        keys.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return pts, cols, keys, (nx, ny, nz)


def write_oct(path, scene) -> bool:
    """Write a Scene as a reference-format .oct cache (block-grouped)."""
    lib = _load()
    if lib is None:
        return False
    s = scene.sorted_by_block()
    keys_sorted = s.block_keys
    uniq, starts = np.unique(keys_sorted, return_index=True)
    counts = np.diff(np.concatenate([starts, [len(keys_sorted)]])).astype(np.int64)
    lo, hi = s.block_bounds(uniq)
    bb = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (B, 6)
    rc = lib.oct_write(
        str(path).encode(),
        int(s.num_blocks[0]), int(s.num_blocks[1]), int(s.num_blocks[2]),
        int(len(uniq)),
        np.ascontiguousarray(uniq.astype(np.int32)).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(counts).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(s.points).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(s.colors).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(bb).ctypes.data_as(ctypes.c_void_p),
    )
    return rc == 0
