"""Native (C) fused augmentation — build + ctypes bindings.

The data loader's host hot path (crop-resize -> color jitter -> grayscale ->
blur -> flip -> normalize) runs as ONE C call per image instead of 6+ PIL
round-trips with Python glue (``fused_augment.c``).  The call releases the
GIL, so the pipeline's thread pool scales across a TPU host's cores.

Build model: no pybind11 in this image — the kernel is plain C compiled with
``g++ -O3 -shared -fPIC`` on first use and cached under
``~/.cache/ilvlm_native/`` keyed by a source hash; bound via ctypes.  If the
toolchain is missing or the compile fails, :func:`get_lib` returns ``None``
and callers fall back to the PIL path (``data/augment.py``).
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sysconfig
import tempfile
import threading

import numpy as np

logger = logging.getLogger("ilvlm")

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fused_augment.c")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_U8P = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_F64P = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _cache_dir() -> str:
    d = os.environ.get("ILVLM_NATIVE_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "ilvlm_native"))
    os.makedirs(d, exist_ok=True)
    return d


def _cpu_tag() -> bytes:
    """ISA fingerprint: -march=native binaries must not be shared across
    heterogeneous hosts (e.g. an NFS home on a pod)."""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    return line
    except OSError:
        pass
    return os.uname().machine.encode()


_CFLAGS = ["-O3", "-march=native", "-ffp-contract=off"]


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    key = src + _cpu_tag() + " ".join(_CFLAGS).encode()
    tag = hashlib.sha256(key).hexdigest()[:16]
    ext = sysconfig.get_config_var("SHLIB_SUFFIX") or ".so"
    so_path = os.path.join(_cache_dir(), f"fused_augment-{tag}{ext}")
    if os.path.exists(so_path):
        return so_path
    # build to a temp name then rename: concurrent processes race benignly
    fd, tmp = tempfile.mkstemp(suffix=ext, dir=_cache_dir())
    os.close(fd)
    # -ffp-contract=off: PIL's blend/HSV math rounds every float32 op; FMA
    # contraction (default at -O3 -march=native) changes truncation results
    cmd = ["g++", *_CFLAGS, "-fPIC", "-shared", "-o", tmp, _SRC, "-lm"]
    try:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except subprocess.CalledProcessError:
            # some toolchains lack -march=native (cross/qemu): portable retry
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return so_path


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.fused_augment.argtypes = [
        _U8P, ctypes.c_int, ctypes.c_int,                       # src, h, w
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,  # box
        ctypes.c_int,                                            # out_size
        _I32P, _F64P, ctypes.c_int,                              # jitter ops/factors/n
        ctypes.c_int, ctypes.c_double, ctypes.c_int,             # gray, sigma, flip
        _F32P, _F32P,                                            # norm scale/offset
        _F32P,                                                   # out
    ]
    lib.fused_augment.restype = ctypes.c_int
    lib.fused_resize_box.argtypes = [
        _U8P, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        _U8P, ctypes.c_int, ctypes.c_int,
    ]
    lib.fused_resize_box.restype = ctypes.c_int
    for name in ("fused_rgb2hsv", "fused_hsv2rgb"):
        fn = getattr(lib, name)
        fn.argtypes = [_U8P, _U8P, ctypes.c_int]
        fn.restype = None
    lib.fused_gray.argtypes = [_U8P, _U8P, ctypes.c_int]
    lib.fused_gray.restype = None
    return lib


def get_lib():
    """The bound shared library, or ``None`` if native augment is unavailable
    (no g++, compile failure, or ``ILVLM_NATIVE_AUGMENT=0``)."""
    global _LIB, _TRIED
    if os.environ.get("ILVLM_NATIVE_AUGMENT", "").strip() == "0":
        return None
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        try:
            _LIB = _bind(ctypes.CDLL(_build()))
        except Exception as e:  # toolchain missing / compile error -> PIL path
            logger.warning("native augment unavailable (%s); using the PIL path", e)
            _LIB = None
        _TRIED = True
    return _LIB


def available() -> bool:
    return get_lib() is not None


def fused_augment(
    src: np.ndarray,
    box,
    out_size: int,
    jitter_ops,
    jitter_factors,
    grayscale: bool,
    blur_sigma: float,
    flip: bool,
    norm_scale: np.ndarray,
    norm_offset: np.ndarray,
) -> np.ndarray:
    """Run the fused chain on an HxWx3 uint8 array; returns SxSx3 float32."""
    lib = get_lib()
    assert lib is not None, "native augment not available"
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w = src.shape[:2]
    ops = np.asarray(jitter_ops, dtype=np.int32)
    factors = np.asarray(jitter_factors, dtype=np.float64)
    out = np.empty((out_size, out_size, 3), dtype=np.float32)
    bx, by, bw, bh = (float(v) for v in box)
    rc = lib.fused_augment(
        src, h, w, bx, by, bw, bh, int(out_size),
        ops, factors, len(ops),
        int(bool(grayscale)), float(blur_sigma), int(bool(flip)),
        np.ascontiguousarray(norm_scale, dtype=np.float32),
        np.ascontiguousarray(norm_offset, dtype=np.float32),
        out,
    )
    if rc != 0:
        raise RuntimeError(f"fused_augment failed with code {rc}")
    return out


def resize_box(src: np.ndarray, box, out_w: int, out_h: int) -> np.ndarray:
    """PIL-style bicubic box resize of an HxWx3 uint8 array (test surface)."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w = src.shape[:2]
    dst = np.empty((out_h, out_w, 3), dtype=np.uint8)
    bx, by, bw, bh = (float(v) for v in box)
    rc = lib.fused_resize_box(src, h, w, bx, by, bw, bh, dst, out_w, out_h)
    if rc != 0:
        raise RuntimeError(f"resize_box failed with code {rc}")
    return dst
