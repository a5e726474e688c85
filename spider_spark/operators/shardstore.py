"""Executor-visible storage for seen-filter shards (VERDICT r3 finding #3).

The in-memory sharded filters hold every shard's bit/slot array on the
driver simultaneously: at 10^10 URLs that is ~12 GB (1%-fpp bloom) or
~21 GB (16-bit cuckoo) of driver heap at every build/grow/wave — the
shard broadcasts are pulled lazily by executors, but the driver pays the
aggregate. Spill mode removes the driver from the data path entirely:

* shard arrays are written **by the executor task that built them** to a
  filesystem visible to both driver and executors (local mode: any
  directory; a cluster: the shared storage the TableIO warehouse already
  assumes) — the driver holds only *paths*;
* filenames embed a monotone version, and writes are atomic
  (tmp + rename), so a worker-side cache keyed by path can never serve
  stale bits and a killed build can never leave a torn file current;
* probes read shards lazily through a per-worker bounded LRU cache —
  exactly the access pattern the lazy broadcasts gave, without a
  driver-resident master copy.

Superseded versions accumulate until :meth:`ShardStore.gc` — callers run
it after the jobs consuming the previous version have finished (the same
point the broadcast lifecycle destroys its handles).
"""

from __future__ import annotations

import os
import uuid
from collections import OrderedDict

import numpy as np

# per-worker-process read cache: path -> array. Versioned filenames make
# stale entries unreachable; the byte cap keeps a long-lived executor from
# accumulating every version it ever probed.
_CACHE: "OrderedDict[str, np.ndarray]" = OrderedDict()
_CACHE_CAP_BYTES = 512 << 20


def _cache_get(path: str):
    arr = _CACHE.get(path)
    if arr is not None:
        _CACHE.move_to_end(path)
    return arr


def _cache_put(path: str, arr: np.ndarray) -> None:
    _CACHE[path] = arr
    _CACHE.move_to_end(path)
    total = sum(a.nbytes for a in _CACHE.values())
    while total > _CACHE_CAP_BYTES and len(_CACHE) > 1:
        _, dropped = _CACHE.popitem(last=False)
        total -= dropped.nbytes


class ShardStore:
    """Versioned flat-file store for one filter's shards. Picklable (plain
    attributes), so probe/build closures ship it to executors."""

    def __init__(self, root: str, dtype: str, name: str | None = None):
        self.root = root
        self.dtype = dtype
        # unique per filter instance: two filters may share a spill root
        self.name = name or uuid.uuid4().hex[:8]
        os.makedirs(root, exist_ok=True)

    def path_for(self, shard: int, version: int) -> str:
        return os.path.join(
            self.root, f"{self.name}_s{shard:05d}_v{version:06d}.bin"
        )

    def write(self, shard: int, version: int, arr: np.ndarray) -> str:
        """Atomic write from whichever process built the shard (normally an
        executor task). Returns the committed path."""
        p = self.path_for(shard, version)
        tmp = f"{p}.tmp.{uuid.uuid4().hex[:6]}"
        with open(tmp, "wb") as f:
            f.write(np.ascontiguousarray(arr).tobytes())
        os.replace(tmp, p)
        return p

    def read(self, path: str, use_cache: bool = True) -> np.ndarray:
        """Read a shard array. Cached copies are read-only — a caller that
        mutates (build/add/delete) must ``.copy()`` or pass
        ``use_cache=False``."""
        if use_cache:
            hit = _cache_get(path)
            if hit is not None:
                return hit
        arr = np.fromfile(path, dtype=self.dtype)
        if use_cache:
            arr.flags.writeable = False
            _cache_put(path, arr)
        return arr

    def gc(self, keep_paths) -> int:
        """Delete this filter's files not in ``keep_paths``. Run only after
        the jobs that probed the previous version have completed. Returns
        the number of files removed."""
        keep = {os.path.basename(p) for p in keep_paths if p}
        removed = 0
        for fn in os.listdir(self.root):
            if (fn.startswith(f"{self.name}_s") and fn not in keep
                    and not fn.endswith((".tmp",)) and ".tmp." not in fn):
                try:
                    os.remove(os.path.join(self.root, fn))
                    removed += 1
                except OSError:
                    pass
        return removed
