"""Single-file keyed record store (LMDB replacement).

The reference caches preprocessed complexes in LMDB
(`models_con/pep_dataloader.py:87-196`); py-lmdb is not in this image, so this
is a minimal append-only container with the same access pattern: string key ->
pickled numpy dict, random access by key or index, cheap to open per worker.

Layout: `<path>` holds concatenated zlib-compressed pickle blobs;
`<path>.idx` is a JSON index {key: [offset, length]} written on close.
Readers mmap the data file; entries decompress on demand.
"""

from __future__ import annotations

import json
import mmap
import os
import pickle
import zlib
from typing import Iterator, Optional


class RecordStoreWriter:
    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._index: dict[str, list[int]] = {}

    def put(self, key: str, obj) -> None:
        blob = zlib.compress(pickle.dumps(obj, protocol=4), level=1)
        offset = self._f.tell()
        self._f.write(blob)
        self._index[key] = [offset, len(blob)]

    def close(self) -> None:
        self._f.close()
        with open(self.path + ".idx", "w") as f:
            json.dump(self._index, f)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordStore:
    """Read-only view; safe to open lazily in each worker process."""

    def __init__(self, path: str):
        self.path = path
        with open(path + ".idx") as f:
            self._index = json.load(f)
        self._keys = list(self._index.keys())
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)

    @property
    def keys(self) -> list:
        return self._keys

    def __len__(self) -> int:
        return len(self._keys)

    def get(self, key: str):
        offset, length = self._index[key]
        return pickle.loads(zlib.decompress(self._mm[offset : offset + length]))

    def get_many(self, keys) -> list:
        """Batched fetch; decompression fans out over the native thread pool
        (pepflowww_tpu/native) when the C++ library is available."""
        from pepflowww_tpu import native

        blobs = []
        for key in keys:
            offset, length = self._index[key]
            blobs.append(self._mm[offset : offset + length])
        # zlib streams don't carry the raw size; use a generous cap per blob.
        caps = [max(16 * len(b), 1 << 16) for b in blobs]
        raws = native.decompress_batch(blobs, caps)
        return [pickle.loads(r) for r in raws]

    def __getitem__(self, i: int):
        return self.get(self._keys[i])

    def __iter__(self) -> Iterator:
        for k in self._keys:
            yield self.get(k)

    def close(self) -> None:
        self._mm.close()
        self._f.close()


def exists(path: str) -> bool:
    return os.path.exists(path) and os.path.exists(path + ".idx")
