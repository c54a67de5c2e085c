"""EVE dataset: HDF5 labels + video frames -> fixed-shape numpy clip dicts.

Reference behavior (src/datasources/eve_sequences.py:196-335): per clip,
read selected frames from the camera video (plus the screen video when
``load_screen_content``), slice h5 label groups by the same indices, derive
``head_R`` from rotation vectors, normalize frames, split the 256x128 eyes
strip into left/right 128x128 patches, zero-pad short clips to
``max_sequence_len`` with zero validity.

Differences from the reference (documented): frames are NHWC float32 (TPU
layout) instead of NCHW; ``timestamps`` stays int64 nanoseconds exactly as
read — rebasing to float32 for the device happens in the collate step
(``to_device_arrays``) because raw epoch-nanoseconds do not fit float32.
"""

import collections
import logging
import os
import threading

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from eve_tpu.data.segmentation import load_or_build_cache, select_sequences
from eve_tpu.data.specs import predefined_splits
from eve_tpu.data.video import VideoReader

logger = logging.getLogger(__name__)


def rodrigues_np(rvec):
    """Rotation vector (3,) -> matrix (3, 3), numpy (host-side)."""
    theta = float(np.linalg.norm(rvec))
    if theta < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = np.asarray(rvec, np.float64).reshape(3) / theta
    K = np.array([[0, -k[2], k[1]],
                  [k[2], 0, -k[0]],
                  [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    return R.astype(np.float32)


def preprocess_frames(frames):
    """uint8 (N, H, W, C) -> float32 NHWC in [-1, 1]."""
    return frames.astype(np.float32) * (2.0 / 255.0) - 1.0


def preprocess_screen_frames(frames):
    """uint8 (N, H, W, C) -> float32 NHWC in [0, 1]."""
    return frames.astype(np.float32) * (1.0 / 255.0)


class EVESequencesBase:
    """Map-style dataset over EVE clips; ``__getitem__`` -> dict of numpy."""

    def __init__(self, dataset_path, config=None,
                 participants_to_use=None, cameras_to_use=None,
                 types_of_stimuli=None, stimulus_name_includes='',
                 live_validation=False, is_final_test=False,
                 cache_dir='./segmentation_cache'):
        if config is None:
            from eve_tpu.config import DefaultConfig
            config = DefaultConfig()
        self.config = config
        if types_of_stimuli is None:
            types_of_stimuli = ['image', 'video', 'wikipedia']
        if cameras_to_use is None:
            cameras_to_use = ['basler', 'webcam_l', 'webcam_c', 'webcam_r']
        assert 'points' not in types_of_stimuli
        assert participants_to_use is not None and len(participants_to_use) > 0
        assert 30 > config.assumed_frame_rate
        assert 30 % config.assumed_frame_rate == 0

        self.path = dataset_path
        self.types_of_stimuli = types_of_stimuli
        self.stimulus_name_includes = stimulus_name_includes
        self.participants_to_use = participants_to_use
        self.cameras_to_use = cameras_to_use
        self.live_validation = live_validation
        self.is_final_test = is_final_test
        self.validation_data_cache = {}
        # Whole-video cache for the final test; an OrderedDict LRU guarded
        # by a lock because the full-test loader runs __getitem__ from
        # several worker THREADS sharing this object (the reference's
        # equivalent cache was per-worker-process, eve_sequences.py:259).
        self.full_video_cache = collections.OrderedDict()
        self._full_video_cache_lock = threading.Lock()
        # Per-video label cache: every window of a video re-read the same
        # h5 groups through a fresh h5py.File, which profiled at ~70% of
        # item cost once video decode got fast-seek. Cache the full-length
        # arrays once per (path, source) and slice per window; labels are
        # small (a few MB per video) so a 64-entry LRU is bounded.
        self._label_cache = collections.OrderedDict()
        self._label_cache_lock = threading.Lock()
        # Decode-once disk cache for windowed decode (framecache.py);
        # content-keyed, so it composes with exact resume and is shared
        # safely across runs. None when disabled.
        self._frame_cache = None
        frame_cache_dir = getattr(config, 'frame_cache_dir', '')
        if frame_cache_dir:
            from eve_tpu.data.framecache import FrameDiskCache
            self._frame_cache = FrameDiskCache(
                frame_cache_dir, getattr(config, 'frame_cache_gb', 20.0))

        segmentations = load_or_build_cache(
            dataset_path, config.assumed_frame_rate, config.max_sequence_len,
            cache_dir)
        self.all_subfolders = select_sequences(
            segmentations, dataset_path, participants_to_use, cameras_to_use,
            types_of_stimuli, stimulus_name_includes,
            require_screen=bool(getattr(config, 'load_screen_content',
                                        False)))
        logger.info('Initialized dataset class for: %s (%d clips)',
                    self.path, len(self.all_subfolders))

    def __len__(self):
        return len(self.all_subfolders)

    def _camera_video_path(self, path, source):
        cfg = self.config
        base = os.path.join(path, source)
        if source == 'screen':
            return base + '.128x72.mp4', tuple(cfg.screen_size)
        if cfg.camera_frame_type == 'full':
            return base + '.mp4', None
        if cfg.camera_frame_type == 'face':
            return base + '_face.mp4', (cfg.face_size[0], cfg.face_size[1])
        if cfg.camera_frame_type == 'eyes':
            return base + '_eyes.mp4', (2 * cfg.eyes_size[0],
                                        cfg.eyes_size[1])
        raise ValueError('Unknown camera frame type: %s'
                         % cfg.camera_frame_type)

    def _load_labels_full(self, path, source):
        """Read ALL label arrays of one h5 file once; (groups, scalars)."""
        cache_key = (path, source)
        with self._label_cache_lock:
            cached = self._label_cache.get(cache_key)
            if cached is not None:
                self._label_cache.move_to_end(cache_key)
                return cached
        assert h5py is not None
        groups, scalars = {}, {}
        with h5py.File(os.path.join(path, source + '.h5'), 'r') as hdf:
            for k1, v1 in hdf.items():
                if isinstance(v1, h5py.Group):
                    groups[k1] = np.asarray(v1['data'])
                    groups[k1 + '_validity'] = np.asarray(v1['validity'])
                else:
                    scalars[k1] = np.asarray(v1)
        loaded = (groups, scalars)
        with self._label_cache_lock:
            self._label_cache[cache_key] = loaded
            while len(self._label_cache) > 64:
                self._label_cache.popitem(last=False)
        return loaded

    def load_all_from_source(self, path, source, selected_indices):
        cfg = self.config
        subentry = {}

        scalar_keys = ()
        if source != 'screen':
            groups, scalars = self._load_labels_full(path, source)
            scalar_keys = tuple(scalars)
            index = np.asarray(selected_indices)
            for k1, full in groups.items():
                # numpy fancy indexing (unlike h5py's) also admits
                # duplicate/unsorted index lists — a superset of the
                # previous per-window h5py reads — and already returns a
                # fresh array, never a view of the cached one.
                subentry[k1] = full[index]
            for k1, value in scalars.items():
                subentry[k1] = np.repeat(
                    np.reshape(value, (1, *value.shape)),
                    repeats=cfg.max_sequence_len, axis=0)
            if 'head_rvec' in subentry:
                subentry['head_R'] = np.stack([
                    rodrigues_np(rvec) for rvec in subentry['head_rvec']])

        if cfg.load_full_frame_for_visualization and source == 'screen':
            _, full_frames = VideoReader(
                os.path.join(path, source + '.mp4'),
                frame_indices=selected_indices).get_frames()
            subentry['full_frame'] = full_frames

        video_path, output_size = self._camera_video_path(path, source)

        if self.is_final_test:
            # Whole-video cache: decode each video once for the full test.
            # One path's sources stay cached together (camera + screen are
            # read alternately per item); a small LRU bounds memory
            # (reference eve_sequences.py:259-263 kept one path per worker
            # PROCESS; our workers are threads sharing this dict, so cap at
            # ~one path per worker and guard with a lock).
            cache_key = (path, source)
            with self._full_video_cache_lock:
                cached = self.full_video_cache.get(cache_key)
                if cached is not None:
                    self.full_video_cache.move_to_end(cache_key)
            if cached is None:
                decoded = VideoReader(
                    video_path, output_size=output_size).get_frames()
                with self._full_video_cache_lock:
                    self.full_video_cache[cache_key] = decoded
                    while len(self.full_video_cache) > 8:
                        self.full_video_cache.popitem(last=False)
                cached = decoded
            timestamps, frames = cached
            # Tolerate truncated videos (fewer decoded frames than the
            # labels claim) like the windowed path does: drop out-of-range
            # indices; the alignment/padding below zeroes their validity.
            in_range = [i for i in selected_indices if i < frames.shape[0]]
            timestamps = timestamps[in_range]
            frames = frames[in_range]
        else:
            cache_key = None
            cached = None
            if self._frame_cache is not None:
                cache_key = self._frame_cache.key(
                    video_path, selected_indices, output_size)
                cached = self._frame_cache.get(cache_key)
            if cached is not None:
                timestamps, frames = cached
            else:
                timestamps, frames = VideoReader(
                    video_path, frame_indices=selected_indices,
                    output_size=output_size).get_frames()
                if self._frame_cache is not None:
                    self._frame_cache.put(cache_key, timestamps, frames)

        subentry['timestamps'] = np.asarray(timestamps, np.int64)
        use_native = getattr(cfg, 'use_native_framepack', True)
        device_prep = getattr(cfg, 'tpu_on_device_preprocess', False)
        if source == 'screen':
            if device_prep:
                subentry['frame'] = np.ascontiguousarray(frames)
            else:
                from eve_tpu.data.framepack import pack_screen_frames
                subentry['frame'] = pack_screen_frames(frames,
                                                       use_native=use_native)
        elif cfg.camera_frame_type == 'eyes':
            if device_prep:
                from eve_tpu.data.framepack import split_eye_frames_u8
                left, right = split_eye_frames_u8(frames)
            else:
                from eve_tpu.data.framepack import pack_eye_frames
                left, right = pack_eye_frames(frames, use_native=use_native)
            subentry['left_eye_patch'] = left
            subentry['right_eye_patch'] = right
        elif device_prep:
            subentry['frame'] = np.ascontiguousarray(frames)
        else:
            subentry['frame'] = preprocess_frames(frames)

        # A truncated/corrupt video can decode fewer frames than its
        # timestamps/labels claim; align every per-frame array to the
        # decoded length so the zero-padding below also zeroes validity for
        # the missing tail (otherwise black frames pair with validity=1).
        n_frames = (subentry['left_eye_patch'].shape[0]
                    if 'left_eye_patch' in subentry
                    else subentry['frame'].shape[0])
        for key, value in subentry.items():
            # Scalar-derived labels (camera matrices, px/mm factors) are
            # repeated constants, not per-frame data: the reference keeps
            # the real values at every row incl. padding
            # (eve_sequences.py scalar repeat) — truncating them here
            # would zero-pad them back as singular zero matrices.
            if key in scalar_keys:
                continue
            if value.shape[0] > n_frames:
                subentry[key] = value[:n_frames]

        # Zero-pad short clips (zero validity for padded frames).
        for key, value in subentry.items():
            if value.shape[0] < cfg.max_sequence_len:
                pad_len = cfg.max_sequence_len - value.shape[0]
                pad_width = [(0, pad_len)] + [(0, 0)] * (value.ndim - 1)
                subentry[key] = np.pad(
                    value, pad_width, mode='constant',
                    constant_values=(False if value.dtype == np.bool_
                                     else 0))
        return subentry

    def __getitem__(self, idx):
        spec = self.all_subfolders[idx]
        path = spec['full_path']
        source = spec['camera_name']

        if self.live_validation:
            # Keyed per clip (the reference keys only path/source,
            # eve_sequences.py:312, so every window of a video returned the
            # first window's data — intended behavior implemented instead).
            cache_key = '%s/%s/%s' % (path, source,
                                      tuple(spec['indices']))
            if cache_key in self.validation_data_cache:
                return self.validation_data_cache[cache_key]

        entry = self.load_all_from_source(path, source, spec['indices'])
        if self.config.load_screen_content:
            sub = self.load_all_from_source(path, 'screen',
                                            spec['screen_indices'])
            for k, v in sub.items():
                entry['screen_%s' % k] = v

        entry['participant'] = spec['participant']
        entry['subfolder'] = spec['subfolder']
        entry['camera'] = spec['camera_name']

        if self.live_validation:
            self.validation_data_cache[cache_key] = entry
        return entry


class EVESequences_train(EVESequencesBase):
    def __init__(self, dataset_path, **kwargs):
        super().__init__(dataset_path,
                         participants_to_use=predefined_splits['train'],
                         **kwargs)


class EVESequences_val(EVESequencesBase):
    def __init__(self, dataset_path, **kwargs):
        super().__init__(dataset_path,
                         participants_to_use=predefined_splits['val'],
                         **kwargs)


class EVESequences_test(EVESequencesBase):
    def __init__(self, dataset_path, **kwargs):
        super().__init__(dataset_path,
                         participants_to_use=predefined_splits['test'],
                         **kwargs)
