"""ctypes binding + on-demand build for the native BPE engine.

The shared library is compiled once (g++ -O2) into the package directory and
loaded lazily; when the toolchain or library is unavailable every consumer
falls back to the pure-Python BPE in ``data/tokenizer.py`` transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bpe.cc")
_LIB = os.path.join(_HERE, "libmms_bpe.so")
_LOCK = threading.Lock()
_LOADED: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native library; None when unavailable."""
    global _LOADED, _BUILD_FAILED
    with _LOCK:
        if _LOADED is not None:
            return _LOADED
        if _BUILD_FAILED:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _BUILD_FAILED = True
            return None
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_set_unk.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _LOADED = lib
        return lib


class NativeBPE:
    """Merge engine over byte-mapped pre-tokens (see ``bpe.cc``)."""

    def __init__(self, vocab: dict, merges, unk_id: int = 3):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False,
                                         encoding="utf-8") as vf:
            for tok, idx in vocab.items():
                vf.write(f"{tok}\t{idx}\n")
            vocab_path = vf.name
        with tempfile.NamedTemporaryFile("w", suffix=".tsv", delete=False,
                                         encoding="utf-8") as mf:
            for left, right in merges:
                mf.write(f"{left}\t{right}\n")
            merges_path = mf.name
        try:
            self._handle = lib.bpe_create(vocab_path.encode(), merges_path.encode())
        finally:
            os.unlink(vocab_path)
            os.unlink(merges_path)
        if not self._handle:
            raise RuntimeError("bpe_create failed")
        lib.bpe_set_unk(self._handle, unk_id)
        self._buf = (ctypes.c_int32 * 4096)()
        self._call_lock = threading.Lock()  # the C engine's memo cache and
        # the result buffer are per-instance mutable state; ctypes releases
        # the GIL during the call

    def encode_pretokens(self, pretokens: List[str]) -> List[int]:
        """pretokens: byte-mapped strings (no raw newlines by construction)."""
        joined = "\n".join(pretokens).encode("utf-8")
        with self._call_lock:
            n = self._lib.bpe_encode(self._handle, joined, self._buf, len(self._buf))
            if n > len(self._buf):  # grow and retry
                self._buf = (ctypes.c_int32 * (2 * n))()
                n = self._lib.bpe_encode(self._handle, joined, self._buf, len(self._buf))
            return list(np.ctypeslib.as_array(self._buf)[:n])

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.bpe_destroy(handle)
            self._handle = None
