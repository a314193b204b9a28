"""Seekable read-only file object over HTTP Range requests.

Serves the same role as the reference's remote-file reader
(moge/utils/webfile.py): random access into large blobs (zipped datasets on
object storage) without downloading them. Own design: built on
``io.RawIOBase`` so the standard library supplies ``read``/``readall``
semantics on top of a single ``readinto`` primitive, and the remote length is
probed with HEAD first (falling back to a 1-byte Range probe for stores that
reject HEAD).
"""

from __future__ import annotations

import io
import re
from typing import Dict, Optional

__all__ = ["WebFile"]

_CONTENT_RANGE_RE = re.compile(r"bytes\s+\d+-\d+/(\d+)")


class WebFile(io.RawIOBase):
    """A read-only, seekable file-like view of a remote URL.

    Every read issues an independent ``Range`` request, so instances are
    cheap and hold no connection state beyond the shared ``requests``
    session; position bookkeeping is purely local.
    """

    def __init__(self, url: str, session=None, headers: Optional[Dict[str, str]] = None,
                 size: Optional[int] = None):
        super().__init__()
        import requests

        self.url = url
        self.session = session if session is not None else requests.Session()
        if headers:
            self.session.headers.update(headers)
        self._pos = 0
        self.size = self._probe_length() if size is None else size

    # -- remote helpers ------------------------------------------------------

    def _probe_length(self) -> int:
        resp = self.session.head(self.url, allow_redirects=True)
        if resp.ok:
            length = resp.headers.get("Content-Length")
            if length is not None and length.isdigit():
                return int(length)
        # Some object stores disallow HEAD: ask for the first byte and parse
        # the total out of the Content-Range echo.
        resp = self.session.get(self.url, headers={"Range": "bytes=0-0"})
        resp.raise_for_status()
        m = _CONTENT_RANGE_RE.match(resp.headers.get("Content-Range", ""))
        if m:
            return int(m.group(1))
        raise IOError(f"cannot determine remote size of {self.url}")

    # -- io.RawIOBase interface ------------------------------------------------

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self._pos

    def available(self) -> int:
        """Bytes remaining from the current position to EOF."""
        return self.size - self._pos

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            target = offset
        elif whence == io.SEEK_CUR:
            target = self._pos + offset
        elif whence == io.SEEK_END:
            target = self.size + offset
        else:
            raise ValueError(f"unsupported whence: {whence}")
        self._pos = min(max(target, 0), self.size)
        return self._pos

    def readinto(self, buffer) -> int:
        want = min(len(buffer), self.size - self._pos)
        if want <= 0:
            return 0
        resp = self.session.get(
            self.url, headers={"Range": f"bytes={self._pos}-{self._pos + want - 1}"}
        )
        resp.raise_for_status()
        chunk = resp.content[:want]
        buffer[: len(chunk)] = chunk
        self._pos += len(chunk)
        return len(chunk)
