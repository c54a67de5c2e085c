"""TensorBoard wrapper and image-grid helpers.

Mirrors the reference's ``Tensorboard`` singleton surface
(src/core/tensorboard.py:28-68): an internal ``current_step`` so call sites
pass only (tag, value); scalar/image/grid. Backed by tensorboardX when
available, else a JSONL event file (so logging never blocks training).
"""

import json
import logging
import os
import time

import numpy as np

logger = logging.getLogger(__name__)

try:
    from tensorboardX import SummaryWriter
except Exception:  # pragma: no cover
    SummaryWriter = None


def make_grid(images, nrow=8, padding=2, normalize=False, scale_each=False):
    """numpy NHWC (or NHW) image batch -> single HWC grid image.

    Equivalent surface to torchvision.utils.make_grid for logging.
    """
    images = np.asarray(images)
    if images.ndim == 3:
        images = images[..., None]
    if images.shape[-1] == 1:
        images = np.repeat(images, 3, axis=-1)
    n, h, w, c = images.shape
    if normalize:
        def norm(x):
            lo, hi = x.min(), x.max()
            return (x - lo) / (hi - lo + 1e-8)
        images = (np.stack([norm(im) for im in images])
                  if scale_each else norm(images))
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncol * (w + padding) + padding, c), images.dtype)
    for idx in range(n):
        r, cidx = idx // ncol, idx % ncol
        y = r * (h + padding) + padding
        x = cidx * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[idx]
    return grid


def compose_training_images(outputs, screen_size=(128, 72)):
    """Build the reference's TensorBoard composite images (host-side).

    Reference behavior (src/train.py:69-115): when screen content is loaded,
    log (a) per-sample vertical stacks [screen; screen*history; history] for
    the initial and refined gaze-history maps (history bilinearly resized to
    the screen frame and clamped to [0, 1]), and (b) normalized grids of the
    GT/initial/final heatmaps, under the same tags.

    Args:
      outputs: numpy-convertible dict from a ``create_images=True`` forward.
      screen_size: (W, H) of the logged screen frames.

    Returns:
      dict tag -> HWC float image.
    """
    import cv2

    images = {}
    sw, sh = screen_size

    def _np(key):
        value = outputs[key]
        if hasattr(value, 'is_fully_addressable') and \
                not value.is_fully_addressable:
            # Multi-host: jit outputs are globally-sharded arrays whose
            # remote shards this process cannot fetch (np.asarray raises).
            # Logged images only need SOME samples — concatenate the local
            # shards (deduped by batch offset; replicated-per-device
            # shards repeat the same offset).
            parts = {}
            for shard in value.addressable_shards:
                index = shard.index[0] if shard.index else slice(None)
                start = getattr(index, 'start', None) or 0
                parts.setdefault(start, np.asarray(shard.data))
            return np.concatenate(
                [parts[k] for k in sorted(parts)], axis=0)
        return np.asarray(value)

    if 'screen_frame' in outputs:
        screen = _np('screen_frame')                       # (B, h, w, 3)
        for name, key in (('initial', 'initial_gaze_history'),
                          ('refined', 'refined_gaze_history')):
            if key not in outputs:
                continue
            hist = _np(key).astype(np.float32)             # (B, H, W)
            hist = np.stack([cv2.resize(hm, (sw, sh),
                                        interpolation=cv2.INTER_LINEAR)
                             for hm in hist])
            # Clamp AFTER the resize, like the reference (src/train.py:
            # 73-76): history maps routinely exceed 1 near fixations, and
            # interpolating the raw map then clamping yields visibly
            # different composites than clamping first.
            hist = np.clip(hist, 0.0, 1.0)
            hist3 = np.repeat(hist[..., None], 3, axis=-1)
            stacked = np.concatenate(
                [screen, screen * hist3, hist3], axis=1)   # vconcat rows
            images['train/screen_plus_%s_history' % name] = make_grid(
                stacked, normalize=True, scale_each=True)

    for tag, key in (('train/0_gt_heatmap', 'gt_heatmap'),
                     ('train/1_initial_heatmap', 'initial_heatmap'),
                     ('train/2_final_heatmap', 'final_heatmap')):
        if key in outputs:
            images[tag] = make_grid(_np(key).astype(np.float32),
                                    normalize=True, scale_each=True)
    return images


class Tensorboard:
    """Step-stateful TB writer; singleton like the reference."""

    _instance = None

    def __new__(cls, *args, **kwargs):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __init__(self, output_dir):
        # __init__ re-runs on every construction of the singleton; when a
        # second Experiment (new output dir) takes over, flush and close
        # the previous run's writer instead of leaking it.
        if getattr(self, 'output_dir', None) == output_dir:
            return
        if getattr(self, '_writer', None) is not None or \
                getattr(self, '_jsonl', None) is not None:
            self.close()
        self.output_dir = output_dir
        self.current_step = 0
        self._writer = None
        self._jsonl = None
        if SummaryWriter is not None:
            try:
                self._writer = SummaryWriter(output_dir)
            except Exception as e:  # pragma: no cover
                logger.warning('tensorboardX unavailable: %s', e)
        if self._writer is None:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, 'scalars.jsonl'), 'a')

    @classmethod
    def _reset_for_testing(cls):
        cls._instance = None

    def update_current_step(self, step):
        self.current_step = step

    def add_scalar(self, tag, value):
        value = float(value)
        if self._writer is not None:
            self._writer.add_scalar(tag, value, self.current_step)
        else:
            self._jsonl.write(json.dumps(
                {'tag': tag, 'value': value, 'step': self.current_step,
                 'time': time.time()}) + '\n')
            self._jsonl.flush()

    def add_image(self, tag, value):
        """value: HWC (or CHW float) numpy image in [0, 1]."""
        if self._writer is None:
            return
        img = np.asarray(value)
        if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
            img = np.transpose(img, (1, 2, 0))
        self._writer.add_image(tag, img, self.current_step,
                               dataformats='HWC')

    def add_grid(self, tag, values):
        self.add_image(tag, make_grid(np.asarray(values)))

    def add_graph(self, fn, *example_args):
        """Log a jitted function's structure (reference logs a torch graph).

        Writes the jaxpr and the optimized HLO module to text files in the
        run directory and mirrors the jaxpr into TensorBoard as text.
        """
        try:
            import jax
            jaxpr = jax.make_jaxpr(fn)(*example_args)
            path = os.path.join(self.output_dir, 'model_jaxpr.txt')
            with open(path, 'w') as f:
                f.write(str(jaxpr))
            try:
                hlo = jax.jit(fn).lower(*example_args).as_text()
                with open(os.path.join(self.output_dir,
                                       'model_hlo.txt'), 'w') as f:
                    f.write(hlo)
            except Exception:  # pragma: no cover - lowering is best-effort
                pass
            if self._writer is not None:
                text = str(jaxpr)
                self._writer.add_text('model/jaxpr',
                                      text[:100000], self.current_step)
        except Exception as e:  # pragma: no cover
            logger.warning('add_graph failed: %s', e)

    def close(self):
        if self._writer is not None:
            self._writer.close()
        if self._jsonl is not None:
            self._jsonl.close()
