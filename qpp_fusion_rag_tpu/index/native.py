"""ctypes bindings for the native sparse-index builder (native/libqpp_native.so).

The C++ side owns tokenization (lowercase alnum split + stopwords + Porter
stemming) and CSR/impact-list construction; this module is a thin, typed
wrapper. The shared library is built on demand with `make -C native`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libqpp_native.so"
_lib = None


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_SO_PATH))

    lib.qpp_idx_new.restype = ctypes.c_void_p
    lib.qpp_idx_new.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int]
    lib.qpp_idx_free.argtypes = [ctypes.c_void_p]
    lib.qpp_idx_add_doc.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.qpp_idx_add_docs.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.qpp_idx_finalize.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.qpp_idx_num_terms.restype = ctypes.c_int32
    lib.qpp_idx_num_terms.argtypes = [ctypes.c_void_p]
    lib.qpp_idx_num_docs.restype = ctypes.c_int32
    lib.qpp_idx_num_docs.argtypes = [ctypes.c_void_p]
    lib.qpp_idx_num_postings.restype = ctypes.c_int64
    lib.qpp_idx_num_postings.argtypes = [ctypes.c_void_p]
    lib.qpp_idx_export.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.qpp_idx_export_doclens.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.qpp_idx_vocab_dump.restype = ctypes.c_int64
    lib.qpp_idx_vocab_dump.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.qpp_idx_vocab_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.qpp_idx_query_terms.restype = ctypes.c_int32
    lib.qpp_idx_query_terms.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
    ]
    _lib = lib
    return lib


class NativeIndexBuilder:
    """RAII handle over the C++ index builder."""

    def __init__(self, k1: float = 0.9, b: float = 0.4,
                 stem: bool = True, stopwords: bool = True):
        self.lib = load_library()
        self.h = self.lib.qpp_idx_new(k1, b, int(stem), int(stopwords))

    @staticmethod
    def _to_bytes(text: str) -> bytes:
        # NUL is the C-side document separator (and c_char_p terminator):
        # an embedded NUL would split one doc into two and misalign every
        # subsequent docno->row mapping. Legal in JSON, so strip it here.
        return text.replace("\x00", " ").encode("utf-8", "ignore")

    def add_doc(self, text: str) -> None:
        self.lib.qpp_idx_add_doc(self.h, self._to_bytes(text))

    def add_docs(self, texts) -> None:
        blob = b"\0".join(self._to_bytes(t) for t in texts) + b"\0"
        self.lib.qpp_idx_add_docs(self.h, blob, len(texts))

    def finalize(self, bm25_weights: bool = True) -> None:
        self.lib.qpp_idx_finalize(self.h, int(bm25_weights))

    @property
    def num_terms(self) -> int:
        return int(self.lib.qpp_idx_num_terms(self.h))

    @property
    def num_docs(self) -> int:
        return int(self.lib.qpp_idx_num_docs(self.h))

    @property
    def num_postings(self) -> int:
        return int(self.lib.qpp_idx_num_postings(self.h))

    def export(self):
        """-> (offsets int64 [T+1], docs int32 [P], weights f32 [P], doc_lens)."""
        T, P, D = self.num_terms, self.num_postings, self.num_docs
        offsets = np.zeros(T + 1, dtype=np.int64)
        docs = np.zeros(P, dtype=np.int32)
        weights = np.zeros(P, dtype=np.float32)
        doc_lens = np.zeros(D, dtype=np.int32)
        self.lib.qpp_idx_export(self.h, offsets, docs, weights)
        self.lib.qpp_idx_export_doclens(self.h, doc_lens)
        return offsets, docs, weights, doc_lens

    def vocab_dump(self) -> str:
        need = self.lib.qpp_idx_vocab_dump(self.h, None, 0)
        buf = ctypes.create_string_buffer(int(need) + 1)
        self.lib.qpp_idx_vocab_dump(self.h, buf, need + 1)
        return buf.raw[:need].decode("utf-8")

    def vocab_load(self, dump: str) -> None:
        self.lib.qpp_idx_vocab_load(self.h, dump.encode("utf-8"))

    def query_terms(self, text: str, max_terms: int = 64):
        ids = np.zeros(max_terms, dtype=np.int32)
        counts = np.zeros(max_terms, dtype=np.float32)
        n = self.lib.qpp_idx_query_terms(
            self.h, text.encode("utf-8", "ignore"), ids, counts, max_terms
        )
        return ids[:n].copy(), counts[:n].copy()

    def close(self) -> None:
        if self.h:
            self.lib.qpp_idx_free(self.h)
            self.h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
