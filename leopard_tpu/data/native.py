"""ctypes bindings for the native index builders (data/_native/*.cpp).

Equivalent role to the reference's compiled helpers module
(megatron/core/datasets/helpers.cpp + Makefile, compiled lazily on rank 0 at
megatron_patch/initialize.py:87). Compiled here on first use with g++ -O3;
every function has a pure-numpy fallback so the package works without a
toolchain (and the fallbacks double as test oracles).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_native", "index_builders.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _so_path() -> str:
    """Cache path keyed by a hash of the reviewed source, so a stale or
    foreign binary can never be silently loaded (no prebuilt .so ships in the
    repo; first use compiles into the user cache)."""
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("LEOPARD_NATIVE_CACHE") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "leopard_tpu",
    )
    try:
        os.makedirs(cache, exist_ok=True)
    except OSError:
        cache = tempfile.gettempdir()
    return os.path.join(cache, f"libindex_builders-{digest}.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _so_path()
        if not os.path.exists(so):
            try:
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
            except (subprocess.CalledProcessError, FileNotFoundError, OSError):
                _build_failed = True
                return None
        lib = ctypes.CDLL(so)
        lib.leopard_build_blending_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int64,
        ]
        lib.leopard_build_exhaustive_blending_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.leopard_build_sample_index.restype = ctypes.c_int64
        lib.leopard_build_sample_index.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.leopard_shuffle_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.leopard_pack_sequences_ffd.restype = ctypes.c_int64
        lib.leopard_pack_sequences_ffd.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_blending_indices(weights: np.ndarray, size: int):
    """→ (dataset_index int16[size], dataset_sample_index int64[size])."""
    weights = np.ascontiguousarray(weights, np.float64)
    ds_idx = np.empty(size, np.int16)
    ds_sample = np.empty(size, np.int64)
    lib = _load()
    if lib is not None:
        lib.leopard_build_blending_indices(
            _ptr(ds_idx, ctypes.c_int16), _ptr(ds_sample, ctypes.c_int64),
            _ptr(weights, ctypes.c_double), len(weights), size,
        )
        return ds_idx, ds_sample
    # numpy fallback (same greedy max-error rule)
    counts = np.zeros(len(weights), np.int64)
    for s in range(size):
        denom = max(float(s), 1.0)
        err = weights * denom - counts
        d = int(np.argmax(err))
        ds_idx[s] = d
        ds_sample[s] = counts[d]
        counts[d] += 1
    return ds_idx, ds_sample


def build_exhaustive_blending_indices(sizes: np.ndarray):
    sizes = np.ascontiguousarray(sizes, np.int64)
    total = int(sizes.sum())
    ds_idx = np.empty(total, np.int16)
    ds_sample = np.empty(total, np.int64)
    lib = _load()
    if lib is not None:
        lib.leopard_build_exhaustive_blending_indices(
            _ptr(ds_idx, ctypes.c_int16), _ptr(ds_sample, ctypes.c_int64),
            _ptr(sizes, ctypes.c_int64), len(sizes),
        )
        return ds_idx, ds_sample
    weights = sizes / total
    counts = np.zeros(len(sizes), np.int64)
    live = np.ones(len(sizes), bool)
    for s in range(total):
        denom = max(float(s), 1.0)
        err = np.where(live, weights * denom - counts, -np.inf)
        d = int(np.argmax(err))
        ds_idx[s] = d
        ds_sample[s] = counts[d]
        counts[d] += 1
        if counts[d] >= sizes[d]:
            live[d] = False
    return ds_idx, ds_sample


def build_sample_index(
    document_lengths: np.ndarray,
    document_order: np.ndarray,
    seq_len: int,
    num_samples: int,
):
    """→ int64 [built+1, 2] rows of (order position, in-document offset)."""
    document_lengths = np.ascontiguousarray(document_lengths, np.int32)
    document_order = np.ascontiguousarray(document_order, np.int32)
    out = np.zeros((num_samples + 1, 2), np.int64)
    lib = _load()
    if lib is not None:
        built = lib.leopard_build_sample_index(
            _ptr(document_lengths, ctypes.c_int32),
            _ptr(document_order, ctypes.c_int32),
            len(document_order), seq_len, num_samples,
            _ptr(out, ctypes.c_int64),
        )
        return out[: built + 1]
    sample, doc_pos, doc_off = 0, 0, 0
    while sample < num_samples and doc_pos < len(document_order):
        remaining = seq_len + 1
        while remaining > 0 and doc_pos < len(document_order):
            doc_len = int(document_lengths[document_order[doc_pos]]) - doc_off
            if doc_len > remaining:
                doc_off += remaining
                remaining = 0
            else:
                remaining -= doc_len
                doc_pos += 1
                doc_off = 0
        sample += 1
        out[sample] = (doc_pos, doc_off)
    return out[: sample + 1]


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    idx = np.arange(n, np.int64) if False else np.arange(n, dtype=np.int64)
    lib = _load()
    if lib is not None:
        lib.leopard_shuffle_indices(_ptr(idx, ctypes.c_int64), n, seed)
        return idx
    rng = np.random.RandomState(seed % (2**32))
    rng.shuffle(idx)
    return idx


def pack_sequences_ffd(lengths: np.ndarray, capacity: int):
    """First-fit-decreasing packing → (bin_ids int32[n] (−1 = too long),
    num_bins)."""
    lengths = np.ascontiguousarray(lengths, np.int32)
    bin_ids = np.empty(len(lengths), np.int32)
    lib = _load()
    if lib is not None:
        nbins = lib.leopard_pack_sequences_ffd(
            _ptr(lengths, ctypes.c_int32), len(lengths), capacity,
            _ptr(bin_ids, ctypes.c_int32),
        )
        return bin_ids, int(nbins)
    order = np.argsort(-lengths, kind="stable")
    space: list[int] = []
    for i in order:
        li = int(lengths[i])
        if li > capacity:
            bin_ids[i] = -1
            continue
        placed = -1
        for b, s in enumerate(space):
            if s >= li:
                placed = b
                break
        if placed < 0:
            space.append(capacity)
            placed = len(space) - 1
        space[placed] -= li
        bin_ids[i] = placed
    return bin_ids, len(space)


def native_available() -> bool:
    return _load() is not None
