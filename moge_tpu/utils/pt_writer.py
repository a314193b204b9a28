"""Minimal torch-free WRITER for torch's zipfile ``.pt`` checkpoint format.

The mirror of ``pt_loader.py``: serializes a python object (dicts / lists /
scalars / numpy arrays) into the ``torch.save`` zip layout — a pickle at
``<name>/data.pkl`` with tensors replaced by persistent-id storage
references, raw little-endian storage blobs at ``<name>/data/<key>``, and a
``version`` record — WITHOUT importing torch. ``torch.load`` (including
``weights_only=True``, whose restricted unpickler admits exactly the globals
emitted here: the storage classes, ``_rebuild_tensor_v2`` and
``collections.OrderedDict``) reads the result, as does the bundled
``pt_loader.load_pt``.

This exists so models trained with moge_tpu can be exported back into the
reference's checkpoint format (``{'model_config': ..., 'model': state_dict}``,
reference moge/model/v2.py:77-107) and consumed by the upstream torch
ecosystem from a TPU host that has no torch install.

The pickle stream is emitted by hand (protocol 2, the torch default): the
object graph of a checkpoint is small and acyclic, so no memoization is
needed, and hand emission avoids having to install fake ``torch`` modules in
``sys.modules`` for the standard pickler's global-lookup checks.

Numpy arrays become tensors. ``ml_dtypes.bfloat16`` arrays (the JAX bf16
host representation) are written as ``BFloat16Storage``. An ``OrderedVal``
wrapper marks dicts that must unpickle as ``collections.OrderedDict`` (torch
state_dicts are OrderedDicts; plain dicts elsewhere stay plain).
"""

from __future__ import annotations

import io
import struct
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_NAMES = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class OrderedVal(dict):
    """Marks a dict to be pickled as a ``collections.OrderedDict``."""


def _storage_name(arr: np.ndarray) -> str:
    if arr.dtype.name == "bfloat16":  # ml_dtypes (numpy has no native bf16)
        return "BFloat16Storage"
    try:
        return _STORAGE_NAMES[arr.dtype]
    except KeyError:
        raise TypeError(f"unsupported tensor dtype for .pt export: {arr.dtype}")


class _Pickler:
    """Hand-rolled pickle protocol-2 emitter for the checkpoint object graph."""

    def __init__(self):
        self.out = io.BytesIO()
        self.storages: Dict[str, bytes] = {}
        self.out.write(b"\x80\x02")  # PROTO 2

    # -- primitives -----------------------------------------------------------
    def _global(self, module: str, name: str) -> None:
        self.out.write(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def _str(self, s: str) -> None:
        b = s.encode("utf-8")
        self.out.write(b"X" + struct.pack("<I", len(b)) + b)

    def _int(self, v: int) -> None:
        if 0 <= v < 256:
            self.out.write(b"K" + struct.pack("<B", v))
        elif 0 <= v < 65536:
            self.out.write(b"M" + struct.pack("<H", v))
        elif -(2 ** 31) <= v < 2 ** 31:
            self.out.write(b"J" + struct.pack("<i", v))
        else:
            enc = v.to_bytes((v.bit_length() + 8) // 8 or 1, "little", signed=True)
            self.out.write(b"\x8a" + struct.pack("<B", len(enc)) + enc)  # LONG1

    def _tuple(self, items) -> None:
        items = tuple(items)
        if len(items) == 0:
            self.out.write(b")")
            return
        if len(items) <= 3:
            for it in items:
                self.save(it)
            self.out.write(b"\x85\x86\x87"[len(items) - 1: len(items)])
            return
        self.out.write(b"(")
        for it in items:
            self.save(it)
        self.out.write(b"t")

    def _dict_items(self, d: dict) -> None:
        if d:
            self.out.write(b"(")
            for k, v in d.items():
                self.save(k)
                self.save(v)
            self.out.write(b"u")  # SETITEMS

    # -- tensors ---------------------------------------------------------------
    def _rebuild_tensor(self, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        self._global("torch._utils", "_rebuild_tensor_v2")
        self.out.write(b"(")
        # storage persistent id
        key = str(len(self.storages))
        name = _storage_name(arr)
        self.storages[key] = arr.tobytes()
        self.out.write(b"(")
        self._str("storage")
        self._global("torch", name)
        self._str(key)
        self._str("cpu")
        self._int(int(arr.size))
        self.out.write(b"t")
        self.out.write(b"Q")  # BINPERSID
        # storage_offset, size, stride (elements), requires_grad, backward hooks
        self._int(0)
        self._tuple(int(s) for s in arr.shape)
        strides = []
        acc = 1
        for s in reversed(arr.shape):
            strides.append(acc)
            acc *= int(s)
        self._tuple(reversed(strides))
        self.out.write(b"\x89")  # False
        self._global("collections", "OrderedDict")
        self.out.write(b")R")  # OrderedDict()
        self.out.write(b"t")   # close arg tuple
        self.out.write(b"R")   # REDUCE

    # -- dispatch ---------------------------------------------------------------
    def save(self, obj: Any) -> None:
        if obj is None:
            self.out.write(b"N")
        elif obj is True:
            self.out.write(b"\x88")
        elif obj is False:
            self.out.write(b"\x89")
        elif isinstance(obj, (int, np.integer)) and not isinstance(obj, bool):
            self._int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self.out.write(b"G" + struct.pack(">d", float(obj)))
        elif isinstance(obj, str):
            self._str(obj)
        elif isinstance(obj, np.ndarray):
            self._rebuild_tensor(obj)
        elif isinstance(obj, OrderedVal):
            self._global("collections", "OrderedDict")
            self.out.write(b")R")
            self._dict_items(obj)
        elif isinstance(obj, dict):
            self.out.write(b"}")
            self._dict_items(obj)
        elif isinstance(obj, (list,)):
            self.out.write(b"]")
            if obj:
                self.out.write(b"(")
                for it in obj:
                    self.save(it)
                self.out.write(b"e")
        elif isinstance(obj, tuple):
            self._tuple(obj)
        else:
            raise TypeError(f"unsupported type for .pt export: {type(obj)}")

    def finish(self) -> bytes:
        self.out.write(b".")
        return self.out.getvalue()


def save_pt(obj: Any, path, archive_name: str = "archive") -> None:
    """Write ``obj`` to ``path`` in torch's zipfile ``.pt`` format.

    ``obj`` may contain dicts, lists, tuples, str/int/float/bool/None, numpy
    arrays (→ cpu tensors), and ``OrderedVal`` dicts (→ OrderedDict). Scalars
    that must load as 0-dim tensors should be passed as 0-dim numpy arrays.
    """
    p = _Pickler()
    p.save(obj)
    data_pkl = p.finish()
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", data_pkl)
        zf.writestr(f"{archive_name}/byteorder", "little")
        for key, blob in p.storages.items():
            zf.writestr(f"{archive_name}/data/{key}", blob)
        zf.writestr(f"{archive_name}/version", "3\n")
