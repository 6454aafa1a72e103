"""ctypes bindings for the native host ingest runtime (native/loader.cpp).

Host-side Morton encode + parallel radix sort for the input pipeline: at
10M+ points the next shard's spatial sort runs on host CPU threads while the
device trains on the current one (the device octree build, graph/octree.py,
then skips its argsort for pre-sorted input).  Bit layout matches
graph/morton.py exactly (30-bit codes, 10 bits/axis, x in the highest bits).

The shared library is compiled lazily with g++ on first use; everything
degrades to a numpy fallback when no compiler is available, so the package
stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "morton_encode_sort", "gather_rows", "load_points_bin",
           "rev_counts", "rev_table", "rev_table_multi",
           "sender_pass", "take_i32"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "loader.cpp")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "_native")
_LIB_PATH = os.path.join(_LIB_DIR, "libe3loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

BITS = 10


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        _build_failed = True
        return None
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB_PATH, src, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        _build_failed = True
        return None
    return ctypes.CDLL(_LIB_PATH)


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            if os.path.exists(_LIB_PATH):
                try:
                    _lib = ctypes.CDLL(_LIB_PATH)
                except OSError:
                    _lib = _build()
            else:
                _lib = _build()
            if _lib is not None:
                _lib.e3_encode_sort_points.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                _lib.e3_gather_rows_f32.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ]
                i32p = ctypes.POINTER(ctypes.c_int32)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                if not hasattr(_lib, "e3_sender_pass"):
                    _lib = _build()  # stale library from an older revision
                if _lib is not None:
                    _lib.e3_rev_count.argtypes = [
                        i32p, u8p, ctypes.c_int64, ctypes.c_int64, i32p,
                    ]
                    _lib.e3_rev_fill.argtypes = [
                        i32p, u8p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_int32, ctypes.c_int32, i32p,
                    ]
                    _lib.e3_rev_fill_multi.argtypes = [
                        i32p, u8p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
                    ]
                    _lib.e3_rev_scatter1.argtypes = [
                        i32p, u8p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_int64, ctypes.c_int32, i32p,
                    ]
                    i8p = ctypes.POINTER(ctypes.c_int8)
                    _lib.e3_sender_pass.argtypes = [
                        i32p, u8p, ctypes.c_int64, ctypes.c_int64,
                        ctypes.c_int64, ctypes.c_int32, i8p, u8p, u8p,
                    ]
                    _lib.e3_take_i32.argtypes = [
                        i32p, i32p, u8p, ctypes.c_int64, i32p,
                    ]
        return _lib


def available() -> bool:
    """True if the native library is (or can be) built and loaded."""
    return _get() is not None


def _np_encode(points: np.ndarray, lo, hi) -> np.ndarray:
    """Numpy fallback; identical semantics to graph/morton.py."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    scale = (1 << BITS) / (hi - lo)
    q = np.clip(((points - lo) * scale).astype(np.int64), 0, (1 << BITS) - 1)

    def part(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (
        (part(q[:, 0]) << 2) | (part(q[:, 1]) << 1) | part(q[:, 2])
    ).astype(np.uint32)


def morton_encode_sort(
    points: np.ndarray, lo, hi
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (points_sorted [N,3] f32, codes_sorted [N] uint32, order [N] int32).

    Threaded native path when available, numpy otherwise.  ``order`` is the
    gather permutation: ``points_sorted == points[order]`` (stable).
    """
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _get()
    if lib is None:
        codes = _np_encode(pts, lo, hi)
        order = np.argsort(codes, kind="stable").astype(np.int32)
        return pts[order], codes[order], order
    lo_a = np.asarray(lo, np.float32)
    hi_a = np.asarray(hi, np.float32)
    out_pts = np.empty_like(pts)
    out_codes = np.empty((n,), np.uint32)
    out_order = np.empty((n,), np.int32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.e3_encode_sort_points(
        fp(pts), ctypes.c_int64(n), fp(lo_a), fp(hi_a), fp(out_pts),
        out_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out_pts, out_codes, out_order


def _as_u8(mask: np.ndarray) -> np.ndarray:
    """Contiguous uint8 view of a mask without copying when possible.

    ``np.ascontiguousarray(mask, np.uint8)`` on a C-contiguous bool array
    copies the whole buffer (numpy treats bool->uint8 as a cast) even
    though the bytes are identical — ~0.3 s per 160 MB mask at the 10M
    partition.  A reinterpreting ``view`` is free."""
    if mask.dtype == np.bool_ and mask.flags.c_contiguous:
        return mask.view(np.uint8)
    return np.ascontiguousarray(mask, np.uint8)


def gather_rows(src: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Threaded ``src[order]`` for [N, F] float32 feature arrays."""
    src = np.ascontiguousarray(src, np.float32)
    order = np.ascontiguousarray(order, np.int32)
    lib = _get()
    if lib is None:
        return src[order]
    out = np.empty((order.shape[0], src.shape[1]), np.float32)
    lib.e3_gather_rows_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(order.shape[0]), ctypes.c_int64(src.shape[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def rev_table_multi(
    tgt: np.ndarray,  # [P, S] int32 flat targets per partition
    mask: Optional[np.ndarray],  # [P, S] bool, or None
    n_targets: int,
    q: int,
) -> Optional[np.ndarray]:
    """Batched [P, n_targets, q] rev tables in ONE native call, in the
    **+1 encoding**: entries are ``slot + 1`` and 0 means empty
    (``ops.gather_scatter.take_dense_rev``'s contract).

    The output is ``np.zeros`` (calloc — lazily-mapped zero pages), so
    empty/sentinel regions are never written at all; the scatter touches
    only the ~S real entries.  This removed the full-table sentinel fill
    that dominated the 10M dense partition (rev_ext: a 2.4 GB table for
    ~2k real entries).  Partitions scatter concurrently (one thread + one
    cursor histogram per partition).  None when the library is absent."""
    lib = _get()
    if lib is None or not hasattr(lib, "e3_rev_scatter1"):
        return None
    P, S = tgt.shape
    tgt = np.ascontiguousarray(tgt, np.int32)
    mk = None if mask is None else _as_u8(mask)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    mp = mk.ctypes.data_as(u8p) if mk is not None else ctypes.cast(None, u8p)
    rev = np.zeros((P, n_targets, q), np.int32)
    lib.e3_rev_scatter1(
        tgt.ctypes.data_as(i32p), mp, ctypes.c_int64(P), ctypes.c_int64(S),
        ctypes.c_int64(n_targets), ctypes.c_int32(q),
        rev.ctypes.data_as(i32p),
    )
    return rev


def sender_pass(senders, mask, npp0, num_parts):
    """(owner int8 [N,K], remote u8 [N,K], row_remote u8 [N]) in ONE
    threaded pass (None if the library is absent) — replaces the
    partitioner's SD0/OWNER/remote numpy pipeline (~5 s at 10M/P=16)."""
    lib = _get()
    if lib is None or not hasattr(lib, "e3_sender_pass"):
        return None
    if num_parts > 127:  # owner is int8; -1 = masked
        return None
    n, k = senders.shape
    senders = np.ascontiguousarray(senders, np.int32)
    mk = _as_u8(mask)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    owner = np.empty((n, k), np.int8)
    remote = np.empty((n, k), np.uint8)
    row_remote = np.empty((n,), np.uint8)
    lib.e3_sender_pass(
        senders.ctypes.data_as(i32p), mk.ctypes.data_as(u8p),
        ctypes.c_int64(n), ctypes.c_int64(k), ctypes.c_int64(npp0),
        ctypes.c_int32(num_parts - 1), owner.ctypes.data_as(i8p),
        remote.ctypes.data_as(u8p), row_remote.ctypes.data_as(u8p),
    )
    return owner, remote.view(bool), row_remote.view(bool)


def take_i32(table, idx, mask):
    """Threaded masked int32 gather: table[mask ? idx : 0] (None if the
    library is absent)."""
    lib = _get()
    if lib is None or not hasattr(lib, "e3_take_i32"):
        return None
    table = np.ascontiguousarray(table, np.int32)
    shape = idx.shape
    idx = np.ascontiguousarray(idx, np.int32).reshape(-1)
    mk = _as_u8(mask).reshape(-1)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    out = np.empty(idx.shape, np.int32)
    lib.e3_take_i32(
        table.ctypes.data_as(i32p), idx.ctypes.data_as(i32p),
        mk.ctypes.data_as(u8p), ctypes.c_int64(idx.shape[0]),
        out.ctypes.data_as(i32p),
    )
    return out.reshape(shape)


def load_points_bin(path: str, dim: int = 3) -> np.ndarray:
    """Memory-map a raw float32 [N, dim] point file (zero-copy until touched)."""
    return np.memmap(path, dtype=np.float32, mode="r").reshape(-1, dim)


def rev_counts(
    tgt: np.ndarray, mask: Optional[np.ndarray], n_targets: int
) -> Optional[np.ndarray]:
    """[n_targets] int32 per-target slot counts (native; None if unavailable).
    Callers stacking tables across partitions use max(counts) to unify q."""
    lib = _get()
    if lib is None:
        return None
    tgt = np.ascontiguousarray(tgt, np.int32)
    mk = None if mask is None else _as_u8(mask)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    mp = mk.ctypes.data_as(u8p) if mk is not None else ctypes.cast(None, u8p)
    counts = np.zeros((n_targets,), np.int32)
    lib.e3_rev_count(
        tgt.ctypes.data_as(i32p), mp, ctypes.c_int64(tgt.shape[0]),
        ctypes.c_int64(n_targets), counts.ctypes.data_as(i32p),
    )
    return counts


def rev_table(
    tgt: np.ndarray,  # [S] int32 flat target per slot (pad: out of range)
    mask: Optional[np.ndarray],  # [S] bool slot validity, or None
    n_targets: int,
    sentinel: int,
    q: Optional[int] = None,  # row width; computed (max count) if None
    out: Optional[np.ndarray] = None,  # [n_targets, q] int32 C-contiguous
) -> Optional[np.ndarray]:
    """[n_targets, q] sender-transpose table via threaded counting scatter.

    For each target t: the flat slot positions i with ``tgt[i] == t`` and
    ``mask[i]`` (order within a row unspecified — ``take_dense_rev`` sums),
    sentinel-padded to q.  Returns None when the native library is
    unavailable (callers keep their numpy path).  Replaces the numpy
    argsort+repeat+scatter construction that dominated the 10M-point dense
    partition (tools/exp_partition_native.py)."""
    lib = _get()
    if lib is None:
        return None
    tgt = np.ascontiguousarray(tgt, np.int32)
    mk = None if mask is None else np.ascontiguousarray(mask, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    mp = mk.ctypes.data_as(u8p) if mk is not None else ctypes.cast(None, u8p)
    if q is None:
        counts = np.zeros((n_targets,), np.int32)
        lib.e3_rev_count(
            tgt.ctypes.data_as(i32p), mp, ctypes.c_int64(tgt.shape[0]),
            ctypes.c_int64(n_targets), counts.ctypes.data_as(i32p),
        )
        q = max(int(counts.max()) if n_targets else 0, 1)
    if out is not None:
        assert out.shape == (n_targets, q) and out.dtype == np.int32 \
            and out.flags.c_contiguous
        rev = out
    else:
        rev = np.empty((n_targets, q), np.int32)
    lib.e3_rev_fill(
        tgt.ctypes.data_as(i32p), mp, ctypes.c_int64(tgt.shape[0]),
        ctypes.c_int64(n_targets), ctypes.c_int32(q),
        ctypes.c_int32(sentinel), rev.ctypes.data_as(i32p),
    )
    return rev
