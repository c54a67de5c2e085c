"""Batching, worker-parallel loading, and host->device collation.

Replaces the reference's ``torch.utils.data.DataLoader`` worker processes
(src/core/training.py:126-132) with a thread pool (cv2/h5py release the GIL
during decode/IO) and a bounded ordered prefetch queue, plus device
double-buffering via ``jax.device_put`` so decode overlaps step compute.
"""

import threading
import queue as queue_lib
from concurrent.futures import ThreadPoolExecutor

import numpy as np

STRING_KEYS = ('participant', 'subfolder', 'camera')
TIMESTAMP_KEYS = ('timestamps', 'screen_timestamps')


def rebase_timestamps(ts):
    """Per-clip rebase of int64 nanosecond stamps to float32-safe values.

    Real frames become (ts - first_real + 1); padded frames stay 0. Only
    timestamp *differences* feed the model (history decay), so rebasing is
    semantics-preserving while keeping float32 precision (raw epoch
    nanoseconds would lose ~100s of ms of precision in float32).
    """
    ts = np.asarray(ts)
    out = np.zeros(ts.shape, np.float32)
    for b in range(ts.shape[0]):
        row = ts[b]
        real = row > 0
        if real.any():
            first = row[real].min()
            out[b][real] = (row[real] - first + 1).astype(np.float32)
    return out


def collate(items):
    """List of per-clip dicts -> single batch dict (numpy stacked)."""
    batch = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if key in STRING_KEYS:
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


def to_device_arrays(batch, device_put=None, exclude=('screen_full_frame',)):
    """Split a collated batch into (device_batch, host_extras).

    Timestamp keys are rebased to float32; string keys and excluded keys
    (e.g. full frames for visualization) stay host-side.
    """
    import jax

    device_batch = {}
    host_extras = {}
    for key, value in batch.items():
        if key in STRING_KEYS or key in exclude or \
                not isinstance(value, np.ndarray):
            host_extras[key] = value
            continue
        if key in TIMESTAMP_KEYS:
            host_extras[key + '_ns'] = value
            value = rebase_timestamps(value)
        elif value.dtype == np.float64:
            value = value.astype(np.float32)
        elif value.dtype == np.int64:
            value = value.astype(np.int32)
        device_batch[key] = value
    if device_put is not None:
        device_batch = device_put(device_batch)
    else:
        device_batch = jax.device_put(device_batch)
    return device_batch, host_extras


class DataLoader:
    """Ordered, thread-parallel batch loader with bounded prefetch.

    ``indices`` restricts iteration to a subset of the dataset (used by the
    live-validation subset and the full final test).
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 num_workers=4, seed=0, prefetch=2, indices=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(0, num_workers)
        self.prefetch = max(1, prefetch)
        self.indices = None if indices is None else list(indices)
        self.seed = seed
        # Epoch position: the shuffle order is derived from (seed, epoch)
        # — NOT from a mutating RandomState — so a resumed run can
        # reconstruct exactly where an interrupted run's data stream stood
        # (see fast_forward). ``epoch`` counts fully consumed iterations;
        # ``_skip_next`` skips already-consumed batches of a partial epoch.
        self.epoch = 0
        self._skip_next = 0

    def fast_forward(self, num_batches):
        """Position the loader as if ``num_batches`` had already been drawn.

        Exact-resume support: the training harness calls this when
        resuming from a checkpoint so the data stream continues where the
        interrupted run stood (same epoch, same position, same shuffle)
        instead of replaying from epoch 0 — with ``fully_reproducible``
        this makes interrupted-and-resumed training bit-identical to an
        uninterrupted run (tests/test_harness.py).
        """
        per_epoch = len(self)
        if per_epoch <= 0:
            return
        self.epoch = num_batches // per_epoch
        self._skip_next = num_batches % per_epoch

    @property
    def num_entries(self):
        return (len(self.indices) if self.indices is not None
                else len(self.dataset))

    def __len__(self):
        n = self.num_entries
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _index_batches(self):
        order = (np.asarray(self.indices) if self.indices is not None
                 else np.arange(len(self.dataset)))
        if self.shuffle:
            order = order.copy()
            # Stateless per-epoch derivation (seed, epoch) -> order.
            np.random.RandomState(
                (self.seed * 1000003 + self.epoch) % (2 ** 32)
            ).shuffle(order)
        batches = []
        for i in range(0, len(order), self.batch_size):
            chunk = order[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                continue
            batches.append(chunk)
        return batches

    def __iter__(self):
        batches = self._index_batches()
        if self._skip_next:
            batches = batches[self._skip_next:]
            self._skip_next = 0
        yield from self._iter_batches(batches)
        # A fully consumed iteration advances the epoch; an abandoned one
        # (preemption, early break) leaves the position to fast_forward.
        self.epoch += 1

    def _iter_batches(self, batches):
        if self.num_workers == 0:
            for chunk in batches:
                yield collate([self.dataset[int(i)] for i in chunk])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = []

            def submit_batch(chunk):
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in chunk]

            it = iter(batches)
            try:
                for _ in range(self.prefetch):
                    window.append(submit_batch(next(it)))
            except StopIteration:
                it = iter(())
            while window:
                futures = window.pop(0)
                try:
                    window.append(submit_batch(next(it)))
                except StopIteration:
                    pass
                yield collate([f.result() for f in futures])


class DevicePrefetcher:
    """Wrap a DataLoader iterator with async host->device transfer."""

    def __init__(self, loader, device_put=None, depth=2):
        self.loader = loader
        self.device_put = device_put
        self.depth = depth

    def __iter__(self):
        q = queue_lib.Queue(maxsize=self.depth)
        sentinel = object()
        stop = threading.Event()

        def put_or_abandon(item):
            # Bounded put so an abandoned consumer (early break or exception
            # in the training loop) releases this thread and its
            # device-resident batches instead of leaking. Applies to data,
            # sentinel and exception puts alike: ANY unbounded q.put() here
            # can block forever once the consumer is gone and the queue full.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue_lib.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self.loader:
                    if not put_or_abandon(to_device_arrays(batch,
                                                           self.device_put)):
                        return
                put_or_abandon(sentinel)
            except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
                put_or_abandon(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            thread.join()
        finally:
            stop.set()
