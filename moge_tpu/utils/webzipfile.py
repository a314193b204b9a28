"""Lock-free random access into remote zip archives (reference
moge/utils/webzipfile.py): the central directory is read once through a
WebFile; each `open()` spawns an independent range-request reader positioned
at that member's local header, so concurrent reads never contend on a shared
file offset (the reference's "lock-free" design, webzipfile.py:24).
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Dict, Optional
from zipfile import ZIP_DEFLATED, ZIP_STORED, BadZipFile, ZipFile, ZipInfo

from .webfile import WebFile

__all__ = ["WebZipFile"]

_FH_SIGNATURE = b"PK\x03\x04"
_FH_FIXED_SIZE = 30


class _BoundedDecompressor(io.RawIOBase):
    """Read a single zip member from its own WebFile range reader."""

    def __init__(self, webfile: WebFile, zinfo: ZipInfo, data_offset: int):
        self._file = webfile
        self._file.seek(data_offset)
        self._remaining_compressed = zinfo.compress_size
        self._size = zinfo.file_size
        self._produced = 0
        if zinfo.compress_type == ZIP_STORED:
            self._decomp = None
        elif zinfo.compress_type == ZIP_DEFLATED:
            self._decomp = zlib.decompressobj(-15)
        else:
            raise NotImplementedError(f"Unsupported compression: {zinfo.compress_type}")
        self._buffer = b""

    def readable(self):
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._produced
        out = bytearray()
        while len(out) < n and self._produced + len(out) < self._size:
            if self._buffer:
                take = min(n - len(out), len(self._buffer))
                out += self._buffer[:take]
                self._buffer = self._buffer[take:]
                continue
            chunk_size = min(1 << 20, self._remaining_compressed)
            if chunk_size <= 0 and self._decomp is not None:
                self._buffer = self._decomp.flush()
                if not self._buffer:
                    break
                continue
            if chunk_size <= 0:
                break
            raw = self._file.read(chunk_size)
            self._remaining_compressed -= len(raw)
            self._buffer = raw if self._decomp is None else self._decomp.decompress(raw)
        self._produced += len(out)
        return bytes(out)


class WebZipFile:
    """Read-only remote zip with lock-free concurrent member reads."""

    def __init__(self, url: str, session=None, headers: Optional[Dict[str, str]] = None):
        self.url = url
        self._webfile = WebFile(url, session=session, headers=headers)
        # Parse the central directory once using the stdlib.
        self._zip = ZipFile(self._webfile, mode="r")
        self.session = self._webfile.session

    def namelist(self):
        return self._zip.namelist()

    def infolist(self):
        return self._zip.infolist()

    def getinfo(self, name: str) -> ZipInfo:
        return self._zip.getinfo(name)

    def open(self, name, mode: str = "r"):
        assert mode == "r", "Only read mode is supported"
        zinfo = name if isinstance(name, ZipInfo) else self._zip.getinfo(name)
        # Independent range reader for this member (lock-free concurrency).
        reader = WebFile(self.url, session=self.session, size=self._webfile.size)
        reader.seek(zinfo.header_offset)
        header = reader.read(_FH_FIXED_SIZE)
        if header[:4] != _FH_SIGNATURE:
            raise BadZipFile(f"Bad magic number for file header of {zinfo.filename}")
        fname_len, extra_len = struct.unpack("<HH", header[26:30])
        data_offset = zinfo.header_offset + _FH_FIXED_SIZE + fname_len + extra_len
        return io.BufferedReader(_BoundedDecompressor(reader, zinfo, data_offset))

    def read(self, name) -> bytes:
        with self.open(name) as f:
            return f.read()

    def close(self):
        self._zip.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
