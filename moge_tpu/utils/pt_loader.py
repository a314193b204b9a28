"""Minimal torch-free reader for torch's zipfile ``.pt`` checkpoint format.

The published MoGe checkpoints are ``torch.save`` archives: a zip containing
``<name>/data.pkl`` (a pickle of the python object with tensors replaced by
persistent-id storage references) plus raw little-endian storage blobs at
``<name>/data/<key>``. This reads them into numpy without importing torch —
needed on TPU hosts without a torch install (reference loads via torch.load,
v2.py:99).

Security: the unpickler only resolves a fixed safelist of constructors;
anything else raises. Tensors are materialized via numpy as_strided + copy.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (numpy has no bf16)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageType:
    def __init__(self, name: str):
        self.name = name


class _AttrDict(dict):
    """dict accepting pickled instance state (torch state_dicts are
    OrderedDicts carrying a `_metadata` attribute via pickle BUILD)."""


class _SafeUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, archive_prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = archive_prefix
        self._storage_cache: Dict[str, np.ndarray] = {}

    def find_class(self, module: str, name: str):
        if module == "collections" and name == "OrderedDict":
            return _AttrDict
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name in ("float32", "float64", "float16", "bfloat16",
                                          "int64", "int32", "int16", "int8", "uint8", "bool"):
            return name
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a, **k: None
        raise pickle.UnpicklingError(f"Blocked unpickle of {module}.{name}")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage"
        if key in self._storage_cache:
            return self._storage_cache[key]
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        name = storage_type.name if isinstance(storage_type, _StorageType) else storage_type
        if name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32).astype(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_STORAGE_DTYPES[name])
        self._storage_cache[key] = arr
        return arr


def _rebuild_tensor_v2(storage: np.ndarray, storage_offset: int, size, stride, *args) -> np.ndarray:
    if len(size) == 0:
        return np.asarray(storage[storage_offset]).copy()
    itemsize = storage.itemsize
    strides_bytes = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        storage[storage_offset:], shape=tuple(size), strides=strides_bytes
    )
    return np.ascontiguousarray(view)


def load_pt(path) -> Any:
    """Load a torch zipfile-format .pt checkpoint into numpy arrays."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path} is not a torch zipfile checkpoint")
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            data = f.read()
        unpickler = _SafeUnpickler(io.BytesIO(data), zf, prefix)
        return unpickler.load()
