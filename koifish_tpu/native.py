"""ctypes bindings to the C++ native host layer (native/*.cpp).

Auto-builds ``libkoifish_native.so`` with make on first use when a
toolchain is present; every entry point has a pure-Python fallback, so
the framework works without the native library (but the native paths are
the production ones — the analog of the reference's all-native host code).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO = os.path.join(_NATIVE_DIR, "libkoifish_native.so")
_lib = None
_tried = False


def load_native() -> Optional[ctypes.CDLL]:
    """Returns the native library, building it if needed; None if
    unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ktok_new.restype = ctypes.c_void_p
    lib.ktok_new.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ktok_free.argtypes = [ctypes.c_void_p]
    lib.ktok_encode_batch.restype = ctypes.c_int32
    lib.ktok_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.kts_open.restype = ctypes.c_void_p
    lib.kts_open.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int64),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.kts_close.argtypes = [ctypes.c_void_p]
    lib.kts_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.kst_open.restype = ctypes.c_void_p
    lib.kst_open.argtypes = [ctypes.c_char_p]
    lib.kst_count.restype = ctypes.c_int32
    lib.kst_count.argtypes = [ctypes.c_void_p]
    lib.kst_info.restype = ctypes.c_int32
    lib.kst_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.kst_data.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.kst_data.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.kst_close.argtypes = [ctypes.c_void_p]
    lib.kbs_new.restype = ctypes.c_void_p
    lib.kbs_new.argtypes = [
        ctypes.c_char_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.kbs_next.restype = ctypes.c_int32
    lib.kbs_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.kbs_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# BPE engine
# ---------------------------------------------------------------------------

class NativeBPE:
    """C++ ranked-merge BPE over pretoken byte strings. Construct from a
    python BPETokenizer; encode_pretokens() replaces its merge loop."""

    def __init__(self, tokenizer) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        u2b = tokenizer._u2b
        ids = sorted(tokenizer.vocab.items(), key=lambda kv: kv[1])
        n_vocab = ids[-1][1] + 1
        strings = [b""] * n_vocab
        for tok, i in ids:
            strings[i] = bytes(u2b[ch] for ch in tok)
        offsets = np.zeros(n_vocab + 1, np.uint32)
        for i, s in enumerate(strings):
            offsets[i + 1] = offsets[i] + len(s)
        vocab_blob = (np.uint32(n_vocab).tobytes() + offsets.tobytes()
                      + b"".join(strings))
        merges = []
        for (a, b), rank in sorted(tokenizer.ranks.items(),
                                   key=lambda kv: kv[1]):
            ia, ib = tokenizer.vocab.get(a), tokenizer.vocab.get(b)
            im = tokenizer.vocab.get(a + b)
            if ia is None or ib is None or im is None:
                continue
            merges.append((ia, ib, im))
        marr = np.array(merges, np.uint32) if merges else \
            np.zeros((0, 3), np.uint32)
        merge_blob = np.uint32(len(merges)).tobytes() + marr.tobytes()
        self._h = lib.ktok_new(vocab_blob, merge_blob)
        self._u2b = u2b

    def encode_pretokens(self, pretokens: Sequence[str]) -> List[int]:
        bufs = [p.encode("utf-8") for p in pretokens]
        text = b"".join(bufs)
        offsets = np.zeros(len(bufs) + 1, np.uint32)
        for i, b in enumerate(bufs):
            offsets[i + 1] = offsets[i] + len(b)
        max_out = len(text) + 16  # ids never exceed input bytes
        out = np.zeros(max_out, np.int32)
        counts = np.zeros(len(bufs), np.int32)
        n = self._lib.ktok_encode_batch(
            self._h, text,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(bufs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n < 0:
            raise RuntimeError("native encode overflow")
        return out[:n].tolist()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ktok_free(self._h)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Shard reader
# ---------------------------------------------------------------------------

class NativeShard:
    """mmap'd token shard with C batch gather."""

    def __init__(self, path: str) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        count = ctypes.c_int64()
        bpt = ctypes.c_int32()
        self._h = lib.kts_open(path.encode(), ctypes.byref(count),
                               ctypes.byref(bpt))
        if not self._h:
            raise IOError(f"cannot open shard {path}")
        self.count = count.value
        self.bpt = bpt.value

    def gather(self, offsets: np.ndarray, width: int) -> np.ndarray:
        offsets = np.ascontiguousarray(offsets, np.int64)
        out = np.empty((len(offsets), width), np.int32)
        self._lib.kts_gather(
            self._h, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(offsets), width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.kts_close(self._h)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Safetensors reader (K_SafeTensors::MMAP analog, Serialize.cpp:428)
# ---------------------------------------------------------------------------

class NativeSafetensors:
    """C++ mmap'd safetensors file; tensors() returns zero-copy numpy
    views over the mapped data region."""

    def __init__(self, path: str) -> None:
        lib = load_native()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.kst_open(path.encode())
        if not self._h:
            raise IOError(f"cannot parse safetensors {path}")
        self.n = lib.kst_count(self._h)

    def tensors(self):
        """→ {name: np view} (dtype mapped via io.safetensors tables;
        unknown dtype names fall back to raw uint8 bytes)."""
        from koifish_tpu.io.safetensors import _DTYPES
        from koifish_tpu.io.kun import _KOI_DTYPES
        out = {}
        for i in range(self.n):
            name = ctypes.create_string_buffer(512)
            dt = ctypes.create_string_buffer(16)
            shape = (ctypes.c_int64 * 8)()
            offs = (ctypes.c_uint64 * 2)()
            nd = self._lib.kst_info(self._h, i, name, 512, dt, shape, 8,
                                    offs)
            if nd < 0:
                raise IOError(f"bad tensor entry {i}")
            nbytes = offs[1] - offs[0]
            ptr = self._lib.kst_data(self._h, i)
            buf = np.ctypeslib.as_array(ptr, shape=(nbytes,))
            dname = dt.value.decode()
            np_dt = _DTYPES.get(dname) or _KOI_DTYPES.get(dname)
            arr = buf.view(np_dt) if np_dt is not None else buf
            dims = tuple(shape[j] for j in range(nd))
            if np_dt is not None and int(np.prod(dims)) == arr.size:
                arr = arr.reshape(dims)
            out[name.value.decode()] = arr
        return out

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.kst_close(self._h)
        except Exception:
            pass


def native_available() -> bool:
    return load_native() is not None


# ---------------------------------------------------------------------------
# Prefetching batch server (native SampLoader loop, native/batchserver.cpp)
# ---------------------------------------------------------------------------

class NativeBatchServer:
    """C++ producer thread gathering shuffled token windows from mmap'd
    shards into a ring of batch buffers — stays ahead of the device while
    Python only memcpy-drains. Determinism lives in the caller: the full
    (shard, offset) schedule in final batch order is handed over at
    construction."""

    def __init__(self, paths: Sequence[str], sched_shard: np.ndarray,
                 sched_off: np.ndarray, group: int, width: int,
                 depth: int = 3):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        blob = b"".join(p.encode() + b"\0" for p in paths)
        ss = np.ascontiguousarray(sched_shard, dtype=np.int32)
        so = np.ascontiguousarray(sched_off, dtype=np.int64)
        self.group, self.width = group, width
        self.n_batches = len(ss) // group
        self._h = self._lib.kbs_new(
            blob, len(paths),
            ss.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            so.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(ss), group, width, depth)
        if not self._h:
            raise RuntimeError("kbs_new failed (bad shard?)")

    def __iter__(self):
        out = np.empty((self.group, self.width), np.int32)
        for _ in range(self.n_batches):
            ok = self._lib.kbs_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if not ok:
                break
            yield out.copy()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.kbs_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
