"""ctypes bindings for the native data-path library (native/nifti_io.cc).

Auto-builds on first import if the shared object is missing and a compiler
is available; every entry point degrades gracefully to the pure-Python
implementations in data/nifti.py when the library can't be built."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmra_native.so"
_lib = None


class _NiftiInfo(ctypes.Structure):
    _fields_ = [
        ("dims", ctypes.c_int64 * 8),
        ("datatype", ctypes.c_int32),
        ("pixdim", ctypes.c_float * 8),
        ("scl_slope", ctypes.c_float),
        ("scl_inter", ctypes.c_float),
        ("srow", ctypes.c_float * 12),
        ("sform_code", ctypes.c_int32),
        ("qform_code", ctypes.c_int32),
        ("quatern", ctypes.c_float * 6),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["sh", str(_NATIVE_DIR / "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.nifti_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(_NiftiInfo),
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.nifti_read.restype = ctypes.c_int
    lib.nifti_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.extract_patches.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_nifti(path) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fast path: (data[x,y,z...] float32, affine 4x4) or None on any
    failure (caller falls back to data/nifti.py)."""
    lib = _load()
    if lib is None:
        return None
    info = _NiftiInfo()
    buf = ctypes.POINTER(ctypes.c_float)()
    rc = lib.nifti_read(str(path).encode(), ctypes.byref(info), ctypes.byref(buf))
    if rc != 0:
        return None
    ndim = int(info.dims[0])
    shape = tuple(int(info.dims[i + 1]) for i in range(max(ndim, 3)))
    count = int(np.prod(shape))
    flat = np.ctypeslib.as_array(buf, shape=(count,)).copy()
    lib.nifti_free(buf)
    data = flat.reshape(shape, order="F")
    if info.sform_code > 0:
        affine = np.eye(4)
        affine[:3, :] = np.asarray(info.srow, np.float64).reshape(3, 4)
    else:
        from .nifti import _quaternion_to_affine

        q = list(info.quatern)
        pix = list(info.pixdim)
        if info.qform_code > 0:
            affine = _quaternion_to_affine(q[0], q[1], q[2], q[3], q[4], q[5], pix)
        else:
            affine = np.diag([pix[1] or 1.0, pix[2] or 1.0, pix[3] or 1.0, 1.0])
    return data, affine


def extract_patches(vol: np.ndarray, starts: np.ndarray,
                    patch: Tuple[int, int, int],
                    n_threads: int = 4) -> Optional[np.ndarray]:
    """Gather (n, p0, p1, p2) patches from a C-order float32 volume."""
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(vol, np.float32)
    starts = np.ascontiguousarray(starts, np.int64).reshape(-1, 3)
    n = len(starts)
    p0, p1, p2 = (int(p) for p in patch)
    if ((starts < 0).any()
            or (starts + [p0, p1, p2] > np.array(vol.shape[:3])).any()):
        raise ValueError("patch out of bounds")
    out = np.empty((n, p0, p1, p2), np.float32)
    lib.extract_patches(vol, *vol.shape[:3], starts.ravel(), n, p0, p1, p2,
                        out, n_threads)
    return out
