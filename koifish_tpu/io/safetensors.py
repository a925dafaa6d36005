"""Safetensors read/write with mmap zero-copy, HF multi-file index, and a
self-describing single-file format.

Rebuild of the reference's ``K_SafeTensors`` serializer
(src/Manifold/Serialize.cpp:428-497 mmap path, :876 save path,
src/Tensor/Safetensors.hpp). Differences, TPU/host-native style:

- reads return numpy views over an ``np.memmap`` — zero-copy until the
  array is shipped to device (the analog of the reference's mmap upload)
- the ``.kun`` single-file trick (config JSON embedded in the file,
  Safetensors.hpp:92-119) is realized through the standard
  ``__metadata__`` header field instead of a msgpack tensor
- HF ``model.safetensors.index.json`` multi-file folders supported
  (reference ``LoadFolderOfST``, Serialize.cpp:1018)
"""
from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Iterator, Optional, Tuple

import ml_dtypes
import numpy as np

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn, "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "U64": np.uint64,
    "BOOL": np.bool_,
}
_DTYPE_NAMES = {np.dtype(v): k for k, v in _DTYPES.items()}


def read_header(path: str) -> Tuple[Dict[str, Any], int]:
    """Parse the 8-byte length + JSON header. Returns (header, data_start)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
    return header, 8 + hlen


def read_safetensors(path: str, mmap: bool = True,
                     ) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Returns ({name: array-view}, metadata). Views are zero-copy slices
    of one memmap when ``mmap`` (read-only)."""
    header, start = read_header(path)
    meta = header.pop("__metadata__", {})
    if mmap:
        buf = np.memmap(path, dtype=np.uint8, mode="r")
    else:
        with open(path, "rb") as f:
            buf = np.frombuffer(f.read(), dtype=np.uint8)
    out = {}
    for name, info in header.items():
        dt = np.dtype(_DTYPES[info["dtype"]])
        s, e = info["data_offsets"]
        flat = buf[start + s: start + e].view(dt)
        out[name] = flat.reshape(info["shape"])
    return out, meta


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Optional[Dict[str, str]] = None) -> None:
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    offset = 0
    arrays = {}
    for name, arr in tensors.items():
        a = np.asarray(arr)
        shape = list(a.shape)
        a = np.ascontiguousarray(a)  # NB: promotes 0-d to 1-d (bytes equal)
        arrays[name] = a
        n = a.nbytes
        header[name] = {
            "dtype": _DTYPE_NAMES[a.dtype],
            "shape": shape,
            "data_offsets": [offset, offset + n],
        }
        offset += n
    hjson = json.dumps(header).encode()
    pad = (-(len(hjson)) % 8)
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for a in arrays.values():
            f.write(a.tobytes())


def iter_hf_folder(folder: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, array) across a HF model dir: single file or
    ``model.safetensors.index.json`` multi-file."""
    index = os.path.join(folder, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for fname in sorted(set(weight_map.values())):
            tensors, _ = read_safetensors(os.path.join(folder, fname))
            yield from tensors.items()
        return
    single = os.path.join(folder, "model.safetensors")
    if os.path.exists(single):
        tensors, _ = read_safetensors(single)
        yield from tensors.items()
        return
    # any *.safetensors files
    found = False
    for fname in sorted(os.listdir(folder)):
        if fname.endswith(".safetensors"):
            found = True
            tensors, _ = read_safetensors(os.path.join(folder, fname))
            yield from tensors.items()
    if not found:
        raise FileNotFoundError(f"no safetensors in {folder}")
