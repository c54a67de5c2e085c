"""Decode-once packed-frame disk cache for the windowed training path.

The reference re-decodes every training window from its mp4 every epoch by
design (``/root/reference/src/datasources/common.py:50-120`` builds a fresh
ffmpeg pipe per ``__getitem__``), and this framework inherited that: the
round-3 profile of the warmed item path put 61% of host cost inside cv2
decode, capping the 1-core end-to-end pipeline at ~7.6% of the device
ceiling (BASELINE.md "Host-pipeline scaling") while rounds 3-4 made the
device side 2-4x faster still. Decode is deterministic per (video,
window), so all epochs after the first are pure waste.

This cache writes each decoded window ONCE — uint8 frames exactly as
``VideoReader`` returns them (resized, RGB, pre-normalization) plus the
int64 timestamps — and serves every later epoch from disk:

  * **Keying**: SHA-1 of (absolute video path, mtime_ns, file size,
    output size, the exact frame-index tuple, cache format version).
    A re-encoded/replaced video changes mtime/size and misses cleanly;
    ``EVE_VIDEO_SEEK`` is absent from the key because seek mode changes
    decode COST, not decoded content (frame-exactness is pinned by the
    video tests).
  * **Layout**: ``<dir>/<k[:2]>/<k>.npz`` holding ``timestamps`` +
    ``frames``. Windows at the training shapes are a few hundred KB, so
    file-per-window keeps the design trivial and random-access free.
  * **Atomicity/integrity**: writes go to a same-directory temp file then
    ``os.replace`` (concurrent workers deduplicate by last-write-wins); a
    corrupt/truncated file fails ``np.load`` and is treated as a miss,
    deleted, and rewritten.
  * **Budget**: ``frame_cache_gb`` bounds the directory. Enforcement is
    amortized (at attach + every 256 writes): least-recently-MODIFIED
    files are evicted to 90% of the budget. Hits do not bump mtime (an
    epoch touches everything anyway, so LRU-by-hit would be a no-op at
    steady state and the stat-write traffic is not worth it).

Because keys are pure content hashes, the cache composes with exact
resume (``fast_forward`` replays the same windows and simply hits) and is
shared safely between concurrent runs on one host.

Measured effect: BASELINE.md "Host-pipeline scaling" round-5 row —
epoch>=2 throughput on this 1-core host rises from the decode-bound
487.7 frames/s to the next (collate/H2D) bottleneck.
"""

import hashlib
import logging
import os
import tempfile
import threading

import numpy as np

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1
_EVICT_CHECK_EVERY = 256


class FrameDiskCache:
    """Content-keyed uint8 window cache under one directory."""

    def __init__(self, root, budget_gb=20.0):
        self.root = os.path.abspath(root)
        self.budget_bytes = int(float(budget_gb) * (1 << 30))
        os.makedirs(self.root, exist_ok=True)
        self._puts = 0
        self._lock = threading.Lock()
        self._enforce_budget()

    # -- keying --------------------------------------------------------

    def key(self, video_path, frame_indices, output_size):
        try:
            st = os.stat(video_path)
        except OSError:
            return None
        h = hashlib.sha1()
        h.update(repr((os.path.abspath(video_path), st.st_mtime_ns,
                       st.st_size, tuple(output_size or ()),
                       tuple(int(i) for i in frame_indices),
                       _FORMAT_VERSION)).encode())
        return h.hexdigest()

    def _path(self, key):
        return os.path.join(self.root, key[:2], key + '.npz')

    # -- read/write ----------------------------------------------------

    def get(self, key):
        """-> (timestamps int64 (N,), frames uint8 (N, H, W, 3)) or None."""
        if key is None:
            return None
        path = self._path(key)
        try:
            with np.load(path) as z:
                return z['timestamps'], z['frames']
        except FileNotFoundError:
            return None
        except Exception:  # corrupt/truncated: miss + delete
            logger.warning('frame cache: dropping unreadable entry %s', path)
            try:
                os.unlink(path)
            except OSError:
                pass
            return None

    def put(self, key, timestamps, frames):
        if key is None:
            return
        path = self._path(key)
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix='.tmp')
        try:
            with os.fdopen(fd, 'wb') as f:
                np.savez(f, timestamps=np.asarray(timestamps, np.int64),
                         frames=np.ascontiguousarray(frames))
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        with self._lock:
            self._puts += 1
            check = self._puts % _EVICT_CHECK_EVERY == 0
        if check:
            self._enforce_budget()

    # -- budget --------------------------------------------------------

    def _enforce_budget(self):
        try:
            entries = []
            total = 0
            for sub in os.scandir(self.root):
                if not sub.is_dir():
                    continue
                for e in os.scandir(sub.path):
                    if not e.name.endswith('.npz'):
                        continue
                    st = e.stat()
                    entries.append((st.st_mtime_ns, st.st_size, e.path))
                    total += st.st_size
            if total <= self.budget_bytes:
                return
            entries.sort()
            target = int(self.budget_bytes * 0.9)
            freed = 0
            for _mt, size, path in entries:
                if total - freed <= target:
                    break
                try:
                    os.unlink(path)
                    freed += size
                except OSError:
                    pass
            logger.info('frame cache: evicted %.1f MB (budget %.1f GB)',
                        freed / 2**20, self.budget_bytes / 2**30)
        except OSError as e:  # never fail the training loop on cache IO
            logger.warning('frame cache: budget scan failed: %s', e)
