"""ctypes binding for the C++ native data loader (``native/recloader.cc``).

Builds the shared library lazily with g++ (cached beside the source), and
falls back to the pure-Python pipeline when compilation is unavailable.  The
native path does TFRecord framing, tf.Example parsing, splitmix64 hashing
and static-shape padding in C++ with a background prefetch thread — the role
tensornet's C++ readers play in the reference stack.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from ..embedding.engine import EmbeddingFeatures, IdBatch

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "recloader.cc")
_LIB = os.path.join(_NATIVE_DIR, "librecloader.so")

_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build_lib() -> str:
    if not os.path.exists(_LIB) or (os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB,
             "-pthread"],
            check=True, capture_output=True)
    return _LIB


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build_lib())
    except Exception as e:      # no toolchain: pure-python fallback
        _lib_error = str(e)
        return None
    lib.rec_loader_create.restype = ctypes.c_void_p
    lib.rec_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.rec_loader_next.restype = ctypes.c_int
    lib.rec_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64))]
    lib.rec_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.rec_splitmix64.restype = ctypes.c_uint64
    lib.rec_splitmix64.argtypes = [ctypes.c_uint64]
    lib.rec_crc32c.restype = ctypes.c_uint32
    lib.rec_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.rec_writer_create.restype = ctypes.c_void_p
    lib.rec_writer_create.argtypes = [ctypes.c_char_p]
    lib.rec_writer_write.restype = ctypes.c_int
    lib.rec_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_size_t]
    lib.rec_writer_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


class NativeRecordLoader:
    """Iterates (batch, scalars) from TFRecord files via the C++ loader.

    ``batch`` is {column_key: IdBatch}; ``scalars`` is {name: (B,) int64}.
    Short final batches are emitted with their true count.
    """

    def __init__(self, files: Sequence[str], embedding: EmbeddingFeatures,
                 batch_size: int, ids_per_feature: int = 5,
                 scalar_features: Sequence[str] = (),
                 cycle_length: int = 4, block_length: int = 8,
                 verify_crc: bool = True):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_lib_error}")
        self._lib = lib
        self.embedding = embedding
        self.batch_size = batch_size
        self.scalar_features = list(scalar_features)

        self.columns = list(embedding.columns.items())
        feat_names = []
        buckets = []
        max_lens = []
        for key, col in self.columns:
            feat_names.append(col.categorical_column.key.encode())
            buckets.append(col.categorical_column.bucket_size)
            max_lens.append(col.seq_max_len if col.is_sequence else ids_per_feature)
        self.max_lens = max_lens

        n = len(feat_names)
        paths = (ctypes.c_char_p * len(files))(*[f.encode() for f in files])
        names = (ctypes.c_char_p * n)(*feat_names)
        bks = (ctypes.c_int64 * n)(*buckets)
        mls = (ctypes.c_int * n)(*max_lens)
        scal = (ctypes.c_char_p * max(len(self.scalar_features), 1))(
            *[s.encode() for s in self.scalar_features])

        self._handle = lib.rec_loader_create(
            paths, len(files), names, bks, mls, n, scal,
            len(self.scalar_features), batch_size, cycle_length, block_length,
            1 if verify_crc else 0)
        self._rows_out = (ctypes.POINTER(ctypes.c_int32) * n)()
        self._mask_out = (ctypes.POINTER(ctypes.c_float) * n)()
        self._scal_out = (ctypes.POINTER(ctypes.c_int64) *
                          max(len(self.scalar_features), 1))()

    def __iter__(self) -> Iterator[Tuple[Dict[str, IdBatch], Dict[str, np.ndarray]]]:
        return self

    def __next__(self):
        if self._handle is None:
            raise StopIteration
        count = self._lib.rec_loader_next(self._handle, self._rows_out,
                                          self._mask_out, self._scal_out)
        if count == 0:
            self.close()
            raise StopIteration
        batch: Dict[str, IdBatch] = {}
        for i, (key, col) in enumerate(self.columns):
            ln = self.max_lens[i]
            rows = np.ctypeslib.as_array(self._rows_out[i],
                                         shape=(self.batch_size, ln))[:count].copy()
            mask = np.ctypeslib.as_array(self._mask_out[i],
                                         shape=(self.batch_size, ln))[:count].copy()
            batch[key] = IdBatch(rows=rows, mask=mask)
        scalars = {}
        for i, name in enumerate(self.scalar_features):
            scalars[name] = np.ctypeslib.as_array(
                self._scal_out[i], shape=(self.batch_size,))[:count].copy()
        return batch, scalars

    def close(self):
        if self._handle is not None:
            self._lib.rec_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeRecordWriter:
    """C++ TFRecord writer (crc32c-framed), the write twin of the loader."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError(f"native writer unavailable: {_lib_error}")
        self._lib = lib
        self._handle = lib.rec_writer_create(path.encode())
        if not self._handle:
            raise IOError(f"cannot open {path}")

    def write(self, record: bytes) -> None:
        if not self._lib.rec_writer_write(self._handle, record, len(record)):
            raise IOError("short write")

    def close(self):
        if self._handle:
            self._lib.rec_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
