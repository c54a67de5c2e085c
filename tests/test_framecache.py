"""Decode-once packed-frame disk cache (eve_tpu/data/framecache.py).

The reference re-decodes every training window every epoch
(src/datasources/common.py:50-120); the cache makes epoch >= 2 a disk
read. These tests pin: item equality with/without the cache, that warm
epochs skip the video decoder entirely, content-key invalidation on video
replacement, corrupt-entry self-healing, and budget eviction.
"""

import os

import numpy as np
import pytest

from eve_tpu.config import DefaultConfig
from eve_tpu.data.dataset import EVESequencesBase
from eve_tpu.data.framecache import FrameDiskCache
from eve_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('eve_fc')
    write_synthetic_dataset(str(root), participants=('train01',),
                            num_frames=40)
    return str(root)


@pytest.fixture
def config(tmp_path):
    DefaultConfig._reset_instance_for_testing()
    cfg = DefaultConfig()
    cfg.import_dict({'max_sequence_len': 6, 'assumed_frame_rate': 10,
                     'load_screen_content': True})
    yield cfg
    DefaultConfig._reset_instance_for_testing()


def _make(dataset_root, config, tmp_path, **extra):
    if extra:
        config.import_dict(extra)
    return EVESequencesBase(
        dataset_root, config=config, participants_to_use=['train01'],
        cameras_to_use=['webcam_c'], types_of_stimuli=['image'],
        cache_dir=str(tmp_path / 'segcache'))


def _items_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        if isinstance(a[k], np.ndarray):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            assert a[k] == b[k], k


def test_items_identical_with_cache(dataset_root, config, tmp_path):
    """Cold (miss+write), warm (hit) and uncached items are identical."""
    ds_plain = _make(dataset_root, config, tmp_path)
    baseline = [ds_plain[i] for i in range(len(ds_plain))]

    config.import_dict({'frame_cache_dir': str(tmp_path / 'fc')})
    ds_cached = _make(dataset_root, config, tmp_path)
    cold = [ds_cached[i] for i in range(len(ds_cached))]
    warm = [ds_cached[i] for i in range(len(ds_cached))]
    for b, c, w in zip(baseline, cold, warm):
        _items_equal(b, c)
        _items_equal(b, w)
    # Entries actually landed on disk (camera + screen windows).
    files = [f for _, _, fs in os.walk(str(tmp_path / 'fc')) for f in fs]
    assert len([f for f in files if f.endswith('.npz')]) >= 6


def test_warm_epoch_skips_decoder(dataset_root, config, tmp_path,
                                  monkeypatch):
    config.import_dict({'frame_cache_dir': str(tmp_path / 'fc')})
    ds = _make(dataset_root, config, tmp_path)
    for i in range(len(ds)):
        ds[i]  # populate

    import eve_tpu.data.dataset as dataset_mod
    calls = []
    real = dataset_mod.VideoReader

    def counting(*a, **kw):
        calls.append(a)
        return real(*a, **kw)

    monkeypatch.setattr(dataset_mod, 'VideoReader', counting)
    warm = [ds[i] for i in range(len(ds))]
    assert calls == [], 'warm epoch still decoded video: %r' % calls
    assert warm[0]['left_eye_patch'].shape[0] == 6


def test_video_replacement_invalidates(dataset_root, tmp_path):
    cache = FrameDiskCache(str(tmp_path / 'fc2'))
    video = os.path.join(dataset_root, 'train01', 'step008_image_test',
                         'webcam_c_eyes.mp4')
    k1 = cache.key(video, [0, 3, 6], (256, 128))
    # Same content, bumped mtime — a replaced/re-encoded file must miss.
    st = os.stat(video)
    os.utime(video, ns=(st.st_atime_ns, st.st_mtime_ns + 10**9))
    try:
        k2 = cache.key(video, [0, 3, 6], (256, 128))
    finally:
        os.utime(video, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert k1 != k2
    # Different indices / output size also key differently.
    assert cache.key(video, [0, 3, 9], (256, 128)) != k1
    assert cache.key(video, [0, 3, 6], (128, 64)) != k1
    # Missing file -> None key, and get/put on it are no-ops.
    assert cache.key(video + '.nope', [0], None) is None
    assert cache.get(None) is None
    cache.put(None, np.zeros(1, np.int64), np.zeros((1, 2, 2, 3), np.uint8))


def test_corrupt_entry_self_heals(tmp_path):
    cache = FrameDiskCache(str(tmp_path / 'fc3'))
    video = str(tmp_path / 'v.mp4')
    with open(video, 'wb') as f:
        f.write(b'x' * 100)
    key = cache.key(video, [0, 1], (4, 4))
    ts = np.arange(2, dtype=np.int64)
    frames = np.full((2, 4, 4, 3), 7, np.uint8)
    cache.put(key, ts, frames)
    got = cache.get(key)
    np.testing.assert_array_equal(got[0], ts)
    np.testing.assert_array_equal(got[1], frames)
    # Truncate the entry: next get reports a miss and deletes it.
    path = cache._path(key)
    with open(path, 'wb') as f:
        f.write(b'not an npz')
    assert cache.get(key) is None
    assert not os.path.exists(path)


def test_budget_eviction(tmp_path):
    # ~590 KB entries against a ~1 MB budget: only the newest survive.
    cache = FrameDiskCache(str(tmp_path / 'fc4'), budget_gb=1e-3)
    video = str(tmp_path / 'v.mp4')
    with open(video, 'wb') as f:
        f.write(b'x' * 100)
    frames = np.random.RandomState(0).randint(
        0, 255, (6, 128, 256, 3)).astype(np.uint8)
    keys = []
    for i in range(4):
        k = cache.key(video, [i], (256, 128))
        cache.put(k, np.arange(1, dtype=np.int64), frames)
        keys.append(k)
        os.utime(cache._path(k),
                 ns=(10**15 + i * 10**9, 10**15 + i * 10**9))
    cache._enforce_budget()
    alive = [k for k in keys if os.path.exists(cache._path(k))]
    assert alive, 'eviction removed everything'
    assert len(alive) < 4, 'budget not enforced'
    # Oldest evicted first.
    assert keys[0] not in alive and keys[-1] in alive
