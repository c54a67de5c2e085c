"""EVE composite model: EyeNet + geometry + heatmaps + RefineNet + losses.

Functionally equivalent to the reference ``EVE`` module
(``/root/reference/src/models/eve.py:49-601``) but restructured TPU-first.
The reference iterates timesteps in Python (eve.py:91), running both full
networks once per frame and threading string-keyed dicts between steps. Here
the clip batch is processed as:

  1. ResNet features for all (B, T, 2 eyes) frames in one MXU batch.
  2. ``lax.scan`` over T for the dense GRU stack only (carry: (B, 128) x 2).
  3. Gaze/pupil heads, offset augmentation, screen projection, heatmap
     render — all batched over (B, T).
  4. RefineNet encoder for all (B, T) frames in one batch.
  5. ``lax.scan`` over T for the conv-RNN bottleneck only (carry:
     (B, 5, 8, 64)).
  6. RefineNet decoder, soft-argmax, losses — batched.

The output dict keys, loss/metric names and numerics match the reference so
harness code and evaluation tooling interoperate.
"""

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from eve_tpu import losses as losses_lib
from eve_tpu.models.eye_net import EyeNet
from eve_tpu.models.refine_net import RefineNet
from eve_tpu.ops import geometry as geo
from eve_tpu.ops import heatmap as hm_ops


@dataclasses.dataclass(frozen=True)
class EveSpec:
    """Static (hashable) model specification; safe to close over under jit."""
    # EyeNet
    eye_net_use_rnn: bool = True
    eye_net_rnn_type: str = 'GRU'
    eye_net_rnn_num_cells: int = 1
    eye_net_num_features: int = 128
    eye_net_use_head_pose_input: bool = True
    eye_net_frozen: bool = False
    # RefineNet
    refine_net_enabled: bool = False
    refine_net_do_offset_augmentation: bool = True
    refine_net_offset_augmentation_sigma: float = 3.0
    # Per-sample probability of keeping the TRUE initial (zero offset)
    # during augmented training; see config.py for the rationale.
    refine_net_offset_augmentation_zero_prob: float = 0.0
    refine_net_use_skip_connections: bool = True
    refine_net_use_rnn: bool = True
    refine_net_rnn_type: str = 'CGRU'
    refine_net_rnn_num_cells: int = 1
    refine_net_num_features: int = 64
    clstm_carry_only: bool = True
    load_screen_content: bool = False
    # Heatmaps
    gaze_heatmap_size: Tuple[int, int] = (128, 72)
    gaze_heatmap_sigma_initial: float = 10.0
    gaze_heatmap_sigma_history: float = 3.0
    gaze_heatmap_sigma_final: float = 5.0
    gaze_history_map_decay_per_ms: float = 0.999
    actual_screen_size: Tuple[int, int] = (1920, 1080)
    screen_size: Tuple[int, int] = (128, 72)
    # Loss coefficients
    loss_coeff_g_ang_initial: float = 1.0
    loss_coeff_PoG_cm_initial: float = 0.0
    loss_coeff_pupil_size: float = 1.0
    loss_coeff_PoG_cm_final: float = 0.001
    loss_coeff_heatmap_ce_initial: float = 0.0
    loss_coeff_heatmap_ce_final: float = 1.0
    loss_coeff_heatmap_mse_final: float = 0.0
    # Compute
    compute_dtype: str = 'float32'
    use_pallas: bool = False
    # Opt-in TPU-native topology (NOT weight-compatible with the reference;
    # the converter refuses): patchify EyeNet stem + lane-filling RefineNet
    # pyramid with a sub-pixel head. See models/refine_net_tpu.py.
    tpu_native_arch: bool = False
    # Which patchify stem the TPU-native EyeNet uses: 'patchify' (8x8/4,
    # the demonstrated default) or 'patchify8' (8x8/8 — quarters every
    # residual stage's spatial work; see BASELINE.md for the measured
    # speed/accuracy trade). Ignored unless tpu_native_arch.
    tpu_native_stem: str = 'patchify'
    # Refined-PoG readout for the TPU-native topology: 'heatmap'
    # (reference semantics: soft-argmax of the refined heatmap) or
    # 'gated' (residual: final = initial + gate * (heatmap_argmax -
    # initial) + delta, gate/delta predicted per frame from decoder
    # features, initialized so final == initial). Fixes the measured
    # ~55-80 px heatmap-readout floor (BASELINE.md); ignored unless
    # tpu_native_arch.
    tpu_native_refine_head: str = 'heatmap'
    # Rematerialize CNN activations in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for not storing activations —
    # enables much larger B*T per chip. Granularity: 'none', 'eye' (ResNet
    # feature extractor only), 'refine' (refine encoder only), 'all'.
    # Plain bools are accepted for back-compat (False='none', True='all').
    remat: object = 'none'

    @property
    def remat_eye(self):
        return self.remat in (True, 'all', 'eye')

    @property
    def remat_refine(self):
        return self.remat in (True, 'all', 'refine')

    @classmethod
    def from_config(cls, config):
        """Build from a DefaultConfig instance (eve_tpu.config)."""
        return cls(
            eye_net_use_rnn=config.eye_net_use_rnn,
            eye_net_rnn_type=config.eye_net_rnn_type,
            eye_net_rnn_num_cells=config.eye_net_rnn_num_cells,
            eye_net_num_features=(config.eye_net_rnn_num_features
                                  if config.eye_net_use_rnn
                                  else config.eye_net_static_num_features),
            eye_net_use_head_pose_input=config.eye_net_use_head_pose_input,
            eye_net_frozen=config.eye_net_frozen,
            refine_net_enabled=config.refine_net_enabled,
            refine_net_do_offset_augmentation=(
                config.refine_net_do_offset_augmentation),
            refine_net_offset_augmentation_sigma=(
                config.refine_net_offset_augmentation_sigma),
            refine_net_offset_augmentation_zero_prob=getattr(
                config, 'refine_net_offset_augmentation_zero_prob', 0.0),
            refine_net_use_skip_connections=(
                config.refine_net_use_skip_connections),
            refine_net_use_rnn=config.refine_net_use_rnn,
            refine_net_rnn_type=config.refine_net_rnn_type,
            refine_net_rnn_num_cells=config.refine_net_rnn_num_cells,
            refine_net_num_features=config.refine_net_num_features,
            clstm_carry_only=config.reference_compat_clstm_carry_only,
            load_screen_content=config.load_screen_content,
            gaze_heatmap_size=tuple(config.gaze_heatmap_size),
            gaze_heatmap_sigma_initial=config.gaze_heatmap_sigma_initial,
            gaze_heatmap_sigma_history=config.gaze_heatmap_sigma_history,
            gaze_heatmap_sigma_final=config.gaze_heatmap_sigma_final,
            gaze_history_map_decay_per_ms=config.gaze_history_map_decay_per_ms,
            actual_screen_size=tuple(config.actual_screen_size),
            screen_size=tuple(config.screen_size),
            loss_coeff_g_ang_initial=config.loss_coeff_g_ang_initial,
            loss_coeff_PoG_cm_initial=config.loss_coeff_PoG_cm_initial,
            loss_coeff_pupil_size=config.loss_coeff_pupil_size,
            loss_coeff_PoG_cm_final=config.loss_coeff_PoG_cm_final,
            loss_coeff_heatmap_ce_initial=config.loss_coeff_heatmap_ce_initial,
            loss_coeff_heatmap_ce_final=config.loss_coeff_heatmap_ce_final,
            loss_coeff_heatmap_mse_final=config.loss_coeff_heatmap_mse_final,
            compute_dtype=config.tpu_compute_dtype,
            use_pallas=config.tpu_use_pallas,
            tpu_native_arch=getattr(config, 'tpu_native_arch', False),
            tpu_native_stem=getattr(config, 'tpu_native_stem', 'patchify'),
            tpu_native_refine_head=getattr(config, 'tpu_native_refine_head',
                                           'heatmap'),
            remat=getattr(config, 'tpu_remat', 'none'),
        )

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == 'bfloat16' else jnp.float32

    def build_eye_net(self):
        return EyeNet(
            num_features=self.eye_net_num_features,
            use_rnn=self.eye_net_use_rnn,
            rnn_type=self.eye_net_rnn_type,
            rnn_num_cells=self.eye_net_rnn_num_cells,
            use_head_pose_input=self.eye_net_use_head_pose_input,
            compute_dtype=self.dtype,
            stem=self.tpu_native_stem if self.tpu_native_arch
            else 'reference',
        )

    def build_refine_net(self):
        if not self.refine_net_enabled:
            return None
        if self.tpu_native_refine_head not in ('heatmap', 'gated'):
            raise ValueError(
                "Unknown tpu_native_refine_head %r (expected 'heatmap' or "
                "'gated')" % (self.tpu_native_refine_head,))
        kw = {}
        cls = RefineNet
        if self.tpu_native_arch:
            from eve_tpu.models.refine_net_tpu import RefineNetTPU
            cls = RefineNetTPU
            kw['readout'] = self.tpu_native_refine_head
        elif self.tpu_native_refine_head != 'heatmap':
            raise ValueError(
                "tpu_native_refine_head='gated' requires tpu_native_arch "
                "(the reference topology keeps reference readout "
                "semantics for weight-level parity)")
        return cls(
            load_screen_content=self.load_screen_content,
            use_skip_connections=self.refine_net_use_skip_connections,
            use_rnn=self.refine_net_use_rnn,
            rnn_type=self.refine_net_rnn_type,
            rnn_num_cells=self.refine_net_rnn_num_cells,
            num_features=self.refine_net_num_features,
            clstm_carry_only=self.clstm_carry_only,
            compute_dtype=self.dtype,
            **kw,
        )


def _to_compute(x, dtype):
    """Cast a camera frame tensor to the compute dtype.

    uint8 inputs (the ``tpu_on_device_preprocess`` path) get the reference's
    host normalization ``*2/255-1`` applied here instead — fused by XLA into
    the cast, so the f32 image is never materialized in HBM.
    """
    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) * (2.0 / 255.0) - 1.0).astype(dtype)
    return x.astype(dtype)


def _screen_to_float(x):
    """Screen frames: uint8 -> [0, 1] float32 on device, else pass through."""
    if x is not None and x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def init_params(spec: EveSpec, rng):
    """Initialize the parameter pytree {'eye_net': ..., 'refine_net': ...}."""
    k1, k2 = jax.random.split(rng)
    eye_net = spec.build_eye_net()
    eye_patch = jnp.zeros((1, 128, 128, 3), jnp.float32)
    head_pose = jnp.zeros((1, 2), jnp.float32)
    params = {'eye_net': eye_net.init(k1, eye_patch, head_pose)['params']}
    refine_net = spec.build_refine_net()
    if refine_net is not None:
        w, h = spec.gaze_heatmap_size
        heatmap = jnp.zeros((1, h, w), jnp.float32)
        screen = (jnp.zeros((1, spec.screen_size[1], spec.screen_size[0], 3),
                            jnp.float32)
                  if spec.load_screen_content else None)
        params['refine_net'] = refine_net.init(
            k2, heatmap, screen, screen_size=spec.screen_size)['params']
    return params


# ----------------------------------------------------------------------
# Label derivation (reference eve.py:441-543)
# ----------------------------------------------------------------------

def calculate_additional_labels(spec: EveSpec, batch, rng, training):
    """Derive labels the reference computes on the fly. Returns a new dict."""
    labels = {}
    mm_per_px = batch.get('millimeters_per_pixel')

    for side in ('left', 'right'):
        k = side + '_PoG_tobii'
        if k in batch:
            labels[side + '_PoG_cm_tobii'] = (
                batch[k] * 0.1 * mm_per_px)
            labels[side + '_PoG_cm_tobii_validity'] = \
                batch[k + '_validity']

    if training and spec.refine_net_do_offset_augmentation:
        sample = next(iter(batch.values()))
        B, T = sample.shape[0], sample.shape[1]
        std = math.radians(spec.refine_net_offset_augmentation_sigma)
        if 'left_kappa_fake' in batch:
            # Caller-supplied kappas (deterministic replay / debugging /
            # parity testing); the reference always draws from np.random
            # (eve.py:468) and offers no injection hook. Both sides must be
            # supplied together — a missing right_kappa_fake would otherwise
            # surface as an opaque KeyError deep in the augmentation branch
            # during jit tracing.
            assert 'right_kappa_fake' in batch, (
                'left_kappa_fake supplied without right_kappa_fake; inject '
                'both or neither')
        else:
            assert rng is not None
            zp = float(spec.refine_net_offset_augmentation_zero_prob)
            if zp > 0.0:
                # One keep/zero draw per SAMPLE, shared by both eyes: a
                # clip is either augmented or shows the true initial.
                # The key split stays 2-way at zp=0 so the default kappa
                # stream is bit-identical to pre-knob behavior.
                kl, kr, kz = jax.random.split(rng, 3)
                keep = (jax.random.uniform(kz, (B, 1), jnp.float32)
                        >= zp).astype(jnp.float32)
            else:
                kl, kr = jax.random.split(rng)
                keep = None
            for side, key in (('left', kl), ('right', kr)):
                kappa = std * jax.random.normal(key, (B, 2), jnp.float32)
                if keep is not None:
                    kappa = kappa * keep
                labels[side + '_kappa_fake'] = jnp.broadcast_to(
                    kappa[:, None, :], (B, T, 2))

    if 'left_o' in batch:
        labels['o'] = 0.5 * (batch['left_o'] + batch['right_o'])
        labels['o_validity'] = batch['left_o_validity']

    if 'left_PoG_tobii' in batch:
        labels['PoG_px_tobii'] = 0.5 * (batch['left_PoG_tobii'] +
                                        batch['right_PoG_tobii'])
        labels['PoG_cm_tobii'] = 0.5 * (labels['left_PoG_cm_tobii'] +
                                        labels['right_PoG_cm_tobii'])
        validity = (batch['left_PoG_tobii_validity'].astype(bool) &
                    batch['right_PoG_tobii_validity'].astype(bool))
        labels['PoG_px_tobii_validity'] = validity
        labels['PoG_cm_tobii_validity'] = validity

        if spec.refine_net_enabled:
            vmask = validity.astype(jnp.float32)[..., None, None]
            for name, sigma in (
                    ('heatmap_initial', spec.gaze_heatmap_sigma_initial),
                    ('heatmap_history', spec.gaze_heatmap_sigma_history),
                    ('heatmap_final', spec.gaze_heatmap_sigma_final)):
                hm = hm_ops.make_heatmaps_fast(
                    labels['PoG_px_tobii'], sigma,
                    heatmap_size=spec.gaze_heatmap_size,
                    actual_screen_size=spec.actual_screen_size,
                    use_pallas=spec.use_pallas)
                labels[name] = hm * vmask
                labels[name + '_validity'] = validity

    if 'PoG_cm_tobii' in labels:
        labels['g'] = geo.calculate_combined_gaze_direction(
            labels['o'], 10.0 * labels['PoG_cm_tobii'],
            batch['left_R'], batch['camera_transformation'])
        labels['g_validity'] = labels['PoG_cm_tobii_validity']

    return labels


# ----------------------------------------------------------------------
# PoG / heatmap branch (reference eve.py:545-601)
# ----------------------------------------------------------------------

def g_to_pog(spec: EveSpec, full, g_left, g_right, with_heatmap=True):
    """Project per-eye gazes to screen, average, derive combined gaze.

    Args:
      full: merged input+label dict with (B, T, ...) tensors.
      g_left, g_right: (B, T, 2) pitch/yaw gazes.

    Returns a dict with side/mean PoG px/cm, combined ``g``, and (optionally)
    the rendered initial-sigma heatmap.
    """
    out = {}
    if 'inv_camera_transformation' not in full:
        return out  # GazeCapture / MPIIGaze case (reference eve.py:550)
    ref = {'inv_camera_transformation': full['inv_camera_transformation'],
           'pixels_per_millimeter': full['pixels_per_millimeter']}
    for side, g in (('left', g_left), ('right', g_right)):
        PoG_mm, PoG_px = geo.to_screen_coordinates(
            full[side + '_o'], g, full[side + '_R'], ref,
            actual_screen_size=spec.actual_screen_size)
        out[side + '_PoG_cm'] = 0.1 * PoG_mm
        out[side + '_PoG_px'] = PoG_px
    out['PoG_px'] = 0.5 * (out['left_PoG_px'] + out['right_PoG_px'])
    out['PoG_cm'] = 0.5 * (out['left_PoG_cm'] + out['right_PoG_cm'])
    out['PoG_mm'] = 10.0 * out['PoG_cm']
    out['g'] = geo.calculate_combined_gaze_direction(
        full['o'], out['PoG_mm'], full['left_R'],
        full['camera_transformation'])
    if with_heatmap and spec.refine_net_enabled:
        out['heatmap'] = hm_ops.make_heatmaps_fast(
            out['PoG_px'], spec.gaze_heatmap_sigma_initial,
            heatmap_size=spec.gaze_heatmap_size,
            actual_screen_size=spec.actual_screen_size,
            use_pallas=spec.use_pallas)
    return out


# ----------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------

def init_stream_state(spec: EveSpec, batch_size):
    """Initial recurrent state for streaming inference.

    Streaming (stateful chunked) inference feeds consecutive T-chunks of one
    video through ``forward(..., initial_states=..., return_states=True)``;
    the returned states carry the GRU / ConvGRU memory across chunk
    boundaries so results match one long clip. The reference has no
    equivalent (it always processes whole pre-cut clips).
    """
    eye_net = spec.build_eye_net()
    state = {
        'eye_left': eye_net.init_state(batch_size),
        'eye_right': eye_net.init_state(batch_size),
    }
    refine_net = spec.build_refine_net()
    if refine_net is not None:
        state['refine'] = refine_net.init_state(batch_size)
    return state


def forward(spec: EveSpec, params, batch, rng=None, training=False,
            output_predictions=False, create_images=False,
            seq_mesh=None, seq_axis='seq',
            initial_states=None, return_states=False):
    """Full EVE forward over a (B, T, ...) clip batch.

    Args:
      params: {'eye_net': ..., 'refine_net': ...} parameter pytrees.
      batch: input dict (NHWC images); see data layer for keys.
      rng: PRNG key, required when training with offset augmentation.
      training: enables kappa offset augmentation and *_unaugmented branches.
      seq_mesh: optional ``jax.sharding.Mesh`` with ``seq_axis`` — shards the
        temporal recurrences over that axis via ``sharded_scan`` (carry
        handoff over ICI); all batched (B*T) stages then shard over the same
        axis under GSPMD. T must divide by the axis size.

    Returns an output dict of losses, metrics and (optionally) predictions,
    with key names matching the reference.
    """
    if seq_mesh is not None:
        from eve_tpu.parallel.temporal import sharded_scan as _sscan
        # Scan carries are (B, ...) and xs/ys (T, B, ...) throughout this
        # model, so a 'data' axis on the mesh shards the batch dim inside
        # the scan too (no all-gather across data shards).
        _batch_axis = 'data' if 'data' in seq_mesh.axis_names else None

        def _scan(step, init, xs):
            return _sscan(step, init, xs, seq_mesh, axis_name=seq_axis,
                          batch_axis=_batch_axis)
    else:
        _scan = jax.lax.scan
    eye_net = spec.build_eye_net()
    refine_net = spec.build_refine_net()
    eye_params = {'params': params['eye_net']}

    labels = calculate_additional_labels(spec, batch, rng, training)
    full = dict(batch)
    full.update(labels)

    left = full['left_eye_patch']
    B, T = left.shape[0], left.shape[1]
    nf = spec.eye_net_num_features

    # --- Stage 1: CNN features for all frames and both eyes, one batch ---
    # Cast to the compute dtype BEFORE the concat: the (2*B*T, H, W, 3)
    # stack is a real HBM copy, and eye patches arrive as float32 (or uint8)
    # from the host — concatenating in bf16 halves that traffic (the model
    # is HBM-bandwidth bound; see bench cost analysis).
    cdt = spec.dtype
    patches = jnp.concatenate([
        _to_compute(full['left_eye_patch'], cdt).reshape(
            (B * T,) + left.shape[2:]),
        _to_compute(full['right_eye_patch'], cdt).reshape(
            (B * T,) + left.shape[2:]),
    ], axis=0)
    if spec.eye_net_use_head_pose_input:
        head_pose = jnp.concatenate([
            full['left_h'].reshape(B * T, 2),
            full['right_h'].reshape(B * T, 2),
        ], axis=0)
    else:
        head_pose = None
    def _features(p, h):
        return eye_net.apply(eye_params, p, h, method=EyeNet.features)

    if spec.remat_eye:
        _features = jax.checkpoint(_features)
    feats = _features(patches, head_pose)
    feats_l = feats[:B * T].reshape(B, T, nf)
    feats_r = feats[B * T:].reshape(B, T, nf)

    # --- Stage 2: temporal scan over the dense RNN stack only ---
    if spec.eye_net_use_rnn:
        # Both eyes share the cell weights, so stack them into one (2B, F)
        # batch: ONE cell application per timestep instead of two. The scan
        # is the only sequential region of the model — its wall-clock is
        # dispatch-latency x step-count, so halving the per-step kernel
        # count matters more than the (tiny) matmul size. Row-wise ops make
        # this bit-identical to per-eye application.
        def gru_step(carry, x):
            out, new_carry = eye_net.apply(eye_params, x, carry,
                                           method=EyeNet.recurrent)
            return new_carry, out

        def _stack(l, r):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), l, r)

        def _split(lr):
            return (jax.tree_util.tree_map(lambda a: a[:B], lr),
                    jax.tree_util.tree_map(lambda a: a[B:], lr))

        if initial_states is not None:
            init_states = _stack(initial_states['eye_left'],
                                 initial_states['eye_right'])
        else:
            init_states = eye_net.init_state(2 * B)
        fin_lr, out_lr = _scan(
            gru_step, init_states,
            jnp.concatenate([jnp.moveaxis(feats_l, 1, 0),
                             jnp.moveaxis(feats_r, 1, 0)], axis=1))
        fin_l, fin_r = _split(fin_lr)
        final_states = {'eye_left': fin_l, 'eye_right': fin_r}
        rnn_l = jnp.moveaxis(out_lr[:, :B], 0, 1)
        rnn_r = jnp.moveaxis(out_lr[:, B:], 0, 1)
    else:
        rnn_l = eye_net.apply(eye_params, feats_l, method=EyeNet.static_path)
        rnn_r = eye_net.apply(eye_params, feats_r, method=EyeNet.static_path)
        final_states = {'eye_left': (), 'eye_right': ()}

    # --- Stage 3: heads, augmentation, projection, heatmaps (batched) ---
    g_l, pupil_l = eye_net.apply(eye_params, rnn_l, method=EyeNet.heads)
    g_r, pupil_r = eye_net.apply(eye_params, rnn_r, method=EyeNet.heads)
    if spec.eye_net_frozen:
        g_l = jax.lax.stop_gradient(g_l)
        g_r = jax.lax.stop_gradient(g_r)

    interm = {
        'left_g_initial': g_l, 'right_g_initial': g_r,
        'left_pupil_size': pupil_l, 'right_pupil_size': pupil_r,
    }

    # Kappa offset augmentation requires the head rotation; geometry-less
    # inputs (the GazeCapture/MPIIGaze pretraining case, reference
    # eve.py:550 — which only guards the PoG branch and would crash here)
    # train on angular/pupil losses alone.
    do_aug = (training and spec.refine_net_do_offset_augmentation and
              'head_R' in full)
    if do_aug:
        un = g_to_pog(spec, full, g_l, g_r)
        for k, v in un.items():
            interm[_suffixed(k, 'initial_unaugmented')] = v
        interm['left_g_initial_unaugmented'] = g_l
        interm['right_g_initial_unaugmented'] = g_r
        g_l = geo.apply_offset_augmentation(
            g_l, full['head_R'], full['left_kappa_fake'])
        g_r = geo.apply_offset_augmentation(
            g_r, full['head_R'], full['right_kappa_fake'])
        interm['left_g_initial'] = g_l
        interm['right_g_initial'] = g_r

    main = g_to_pog(spec, full, g_l, g_r)
    for k, v in main.items():
        interm[_suffixed(k, 'initial')] = v

    # Gaze history maps are visualization-only outputs (the reference stores
    # them per step but RefineNet never consumes them) — render on demand.
    if create_images and spec.refine_net_enabled and \
            'PoG_px_initial' in interm and 'PoG_px_tobii' in full:
        hist_hm = hm_ops.make_heatmaps(
            interm['PoG_px_initial'], spec.gaze_heatmap_sigma_history,
            heatmap_size=spec.gaze_heatmap_size,
            actual_screen_size=spec.actual_screen_size)
        interm['history_initial'] = hm_ops.decayed_history_scan(
            hist_hm, full['timestamps'].astype(jnp.float32),
            full['PoG_px_tobii_validity'].astype(jnp.float32),
            decay_per_ms=spec.gaze_history_map_decay_per_ms)

    # --- Stages 4-6: RefineNet (batched encoder/decoder, scanned cell) ---
    if refine_net is not None and 'heatmap_initial' in interm:
        rn_params = {'params': params['refine_net']}
        screen = (_screen_to_float(full.get('screen_frame'))
                  if spec.load_screen_content else None)
        net_in = refine_net.apply(
            rn_params, interm['heatmap_initial'], screen,
            screen_size=spec.screen_size, method='assemble_input')
        flat_in = net_in.reshape((B * T,) + net_in.shape[2:])

        def _encode(x):
            return refine_net.apply(rn_params, x, method='encode')

        if spec.remat_refine:
            _encode = jax.checkpoint(_encode)
        bottleneck_in, skips = _encode(flat_in)
        bt_shape = bottleneck_in.shape[1:]
        bottleneck_bt = bottleneck_in.reshape((B, T) + bt_shape)

        if spec.refine_net_use_rnn:
            def cell_step(carry, x):
                out, new_carry = refine_net.apply(
                    rn_params, x, carry, method='bottleneck_step')
                return new_carry, out

            if initial_states is not None and 'refine' in initial_states:
                init = initial_states['refine']
            else:
                init = refine_net.init_state(B)
            fin_refine, scanned = _scan(
                cell_step, init, jnp.moveaxis(bottleneck_bt, 1, 0))
            final_states['refine'] = fin_refine
            bottleneck_out = jnp.moveaxis(scanned, 0, 1).reshape(
                (B * T,) + bt_shape)
        else:
            bottleneck_out = bottleneck_in
            final_states['refine'] = ()

        gated = (spec.tpu_native_arch and
                 spec.tpu_native_refine_head == 'gated')
        if gated:
            heatmap_final, gate, delta = refine_net.apply(
                rn_params, bottleneck_out, skips, method='decode_readout')
            gate = gate.reshape(B, T, 2)
            delta = delta.reshape(B, T, 2)
        else:
            heatmap_final = refine_net.apply(
                rn_params, bottleneck_out, skips, method='decode')
        w, h = spec.gaze_heatmap_size
        interm['heatmap_final'] = heatmap_final.reshape(B, T, h, w)

        interm['PoG_px_final'] = hm_ops.soft_argmax_fast(
            interm['heatmap_final'],
            heatmap_size=spec.gaze_heatmap_size,
            actual_screen_size=spec.actual_screen_size,
            use_pallas=spec.use_pallas)
        if gated:
            # Residual readout: the heatmap's soft-argmax proposes a
            # correction DIRECTION from the initial estimate; the learned
            # gate (init ~0: final == initial) decides how far to move and
            # delta adds a sub-bin px correction — the final estimate is
            # no longer quantized by the 128x72 heatmap grid, removing the
            # measured ~55-80 px readout floor (BASELINE.md staged study).
            # During training PoG_px_initial is the offset-AUGMENTED
            # estimate — exactly what the network saw as its input
            # heatmap, so the gate learns to judge the estimate it was
            # actually given.
            interm['PoG_px_heatmap_final'] = interm['PoG_px_final']
            interm['PoG_px_final'] = (
                interm['PoG_px_initial'] +
                gate * (interm['PoG_px_final'] - interm['PoG_px_initial']) +
                delta)
            interm['refine_gate'] = gate
        cm_per_px = 0.1 * full['millimeters_per_pixel']
        interm['PoG_cm_final'] = interm['PoG_px_final'] * cm_per_px
        interm['g_final'] = geo.calculate_combined_gaze_direction(
            full['o'], 10.0 * interm['PoG_cm_final'],
            full['left_R'], full['camera_transformation'])

        if create_images and 'PoG_px_tobii' in full:
            # The refined history accumulates the raw network-refined
            # heatmaps themselves (reference eve.py:150-155), unlike the
            # initial history which renders sigma_history Gaussians at the
            # PoG estimate (eve.py:592-595).
            interm['history_final'] = hm_ops.decayed_history_scan(
                interm['heatmap_final'].astype(jnp.float32),
                full['timestamps'].astype(jnp.float32),
                full['PoG_px_tobii_validity'].astype(jnp.float32),
                decay_per_ms=spec.gaze_history_map_decay_per_ms)

    # --- Outputs ---
    output = {}
    output['left_pupil_size'] = interm['left_pupil_size']
    output['right_pupil_size'] = interm['right_pupil_size']

    if output_predictions:
        for k in ('timestamps', 'o', 'left_R', 'head_R',
                  'millimeters_per_pixel', 'pixels_per_millimeter',
                  'camera_transformation', 'inv_camera_transformation'):
            if k in full:
                output[k] = full[k]
        for k in ('g_initial', 'PoG_px_initial', 'PoG_cm_initial'):
            if k in interm:
                output[k] = interm[k]
        if 'g' in full:
            output['g'] = full['g']
            output['validity'] = full['PoG_px_tobii_validity']
            output['PoG_cm'] = full['PoG_cm_tobii']
            output['PoG_px'] = full['PoG_px_tobii']
        if refine_net is not None:
            for k in ('g_final', 'PoG_px_final', 'PoG_cm_final'):
                if k in interm:
                    output[k] = interm[k]

    if create_images:
        if spec.load_screen_content and 'screen_frame' in full:
            output['screen_frame'] = _screen_to_float(
                full['screen_frame'][:, -1])
        if 'history_initial' in interm:
            output['initial_gaze_history'] = interm['history_initial'][:, -1]
        if 'heatmap_initial' in interm:
            output['initial_heatmap'] = interm['heatmap_initial'][:, -1]
        if 'heatmap_final' in interm:
            output['final_heatmap'] = interm['heatmap_final'][:, -1]
        if 'history_final' in interm:
            output['refined_gaze_history'] = interm['history_final'][:, -1]
        if 'heatmap_final' in full:
            output['gt_heatmap'] = full['heatmap_final'][:, -1]
        if 'left_g_tobii' in full:
            output['left_g_gt'] = full['left_g_tobii']
            output['PoG_px_gt'] = full.get('PoG_px_tobii')
            output['PoG_px_gt_validity'] = full.get('PoG_px_tobii_validity')
        output['left_g_initial'] = interm['left_g_initial']
        if 'PoG_px_initial' in interm:
            output['PoG_px_initial'] = interm['PoG_px_initial']
        if 'g_final' in interm:
            output['g_final'] = interm['g_final']
            output['PoG_px_final'] = interm['PoG_px_final']

    calculate_losses_and_metrics(spec, full, interm, output, training)

    # --- Weighted total (reference eve.py:233-265) ---
    full_loss = jnp.zeros((), jnp.float32)
    if 'loss_ang_left_g_initial' in output:
        full_loss += spec.loss_coeff_g_ang_initial * (
            output['loss_ang_left_g_initial'] +
            output['loss_ang_right_g_initial'])
    if 'loss_mse_left_PoG_cm_initial' in output and \
            spec.loss_coeff_PoG_cm_initial > 0.0:
        full_loss += spec.loss_coeff_PoG_cm_initial * (
            output['loss_mse_left_PoG_cm_initial'] +
            output['loss_mse_right_PoG_cm_initial'])
    if 'loss_l1_left_pupil_size' in output:
        full_loss += spec.loss_coeff_pupil_size * (
            output['loss_l1_left_pupil_size'] +
            output['loss_l1_right_pupil_size'])
    if 'loss_mse_PoG_cm_final' in output:
        full_loss += spec.loss_coeff_PoG_cm_final * \
            output['loss_mse_PoG_cm_final']
    if 'loss_ce_heatmap_initial' in output:
        full_loss += spec.loss_coeff_heatmap_ce_initial * \
            output['loss_ce_heatmap_initial']
    if 'loss_ce_heatmap_final' in output:
        full_loss += spec.loss_coeff_heatmap_ce_final * \
            output['loss_ce_heatmap_final']
    if 'loss_mse_heatmap_final' in output:
        full_loss += spec.loss_coeff_heatmap_mse_final * \
            output['loss_mse_heatmap_final']
    output['full_loss'] = full_loss
    if return_states:
        output['states'] = final_states
    return output


def _suffixed(key, suffix):
    """'left_PoG_cm' + 'initial' -> 'left_PoG_cm_initial'; 'g' -> 'g_initial'."""
    return key + '_' + suffix


# ----------------------------------------------------------------------
# Losses and metrics (reference eve.py:286-439)
# ----------------------------------------------------------------------

def calculate_losses_and_metrics(spec, full, interm, output, training):
    # Must mirror forward()'s do_aug condition: when augmentation was
    # skipped, the *_unaugmented branches do not exist and the plain keys
    # hold the unaugmented predictions.
    do_aug = (training and spec.refine_net_do_offset_augmentation and
              'head_R' in full)

    def have(d, k):
        return k in d

    for side in ('left', 'right'):
        gt = side + '_g_tobii'
        pred_key = (side + '_g_initial_unaugmented' if do_aug
                    else side + '_g_initial')
        if have(interm, pred_key) and have(full, gt):
            output['loss_ang_' + side + '_g_initial'] = losses_lib.angular_loss(
                interm[pred_key], full[gt], full[gt + '_validity'])

        gt = side + '_PoG_cm_tobii'
        pred_key = (side + '_PoG_cm_initial_unaugmented' if do_aug
                    else side + '_PoG_cm_initial')
        if have(interm, pred_key) and have(full, gt):
            output['loss_mse_' + side + '_PoG_cm_initial'] = \
                losses_lib.mse_loss(interm[pred_key], full[gt],
                                    full[gt + '_validity'])
            output['metric_euc_' + side + '_PoG_cm_initial'] = \
                losses_lib.euclidean_loss(interm[pred_key], full[gt],
                                          full[gt + '_validity'])

        gt = side + '_PoG_tobii'
        pred_key = side + '_PoG_px_initial'
        if have(interm, pred_key) and have(full, gt):
            output['metric_euc_' + pred_key] = losses_lib.euclidean_loss(
                interm[pred_key], full[gt], full[gt + '_validity'])

        gt = side + '_p'
        pred_key = side + '_pupil_size'
        if have(interm, pred_key) and have(full, gt):
            output['loss_l1_' + pred_key] = losses_lib.l1_loss(
                interm[pred_key], full[gt], full[gt + '_validity'])

    # Left/right consistency
    if have(full, 'left_PoG_tobii') and have(full, 'right_PoG_tobii') and \
            have(interm, 'left_PoG_cm_initial'):
        lr_validity = (full['left_PoG_tobii_validity'].astype(bool) &
                       full['right_PoG_tobii_validity'].astype(bool))
        output['loss_mse_lr_consistency'] = losses_lib.mse_loss(
            interm['left_PoG_cm_initial'], interm['right_PoG_cm_initial'],
            lr_validity)
        output['metric_euc_lr_consistency'] = losses_lib.euclidean_loss(
            interm['left_PoG_cm_initial'], interm['right_PoG_cm_initial'],
            lr_validity)

    # Heatmap losses
    pred_key = ('heatmap_initial_unaugmented' if do_aug else 'heatmap_initial')
    if have(interm, pred_key) and have(full, 'heatmap_initial'):
        output['loss_ce_heatmap_initial'] = losses_lib.cross_entropy_loss(
            interm[pred_key], full['heatmap_initial'],
            full['heatmap_initial_validity'])

    if have(interm, 'heatmap_final') and have(full, 'heatmap_final'):
        output['loss_ce_heatmap_final'] = losses_lib.cross_entropy_loss(
            interm['heatmap_final'], full['heatmap_final'],
            full['heatmap_final_validity'])
        output['loss_mse_heatmap_final'] = losses_lib.mse_loss(
            interm['heatmap_final'], full['heatmap_final'],
            full['heatmap_final_validity'])

    # Metrics on the unaugmented branch
    if do_aug:
        for pred_key, gt, fn, name in (
                ('PoG_px_initial_unaugmented', 'PoG_px_tobii',
                 losses_lib.euclidean_loss, 'metric_euc_'),
                ('PoG_cm_initial_unaugmented', 'PoG_cm_tobii',
                 losses_lib.euclidean_loss, 'metric_euc_'),
                ('g_initial_unaugmented', 'g',
                 losses_lib.angular_loss, 'metric_ang_')):
            if have(interm, pred_key) and have(full, gt):
                output[name + pred_key] = fn(
                    interm[pred_key], full[gt], full[gt + '_validity'])

    # Initial and final combined estimates
    for pred_key, gt in (('PoG_px_initial', 'PoG_px_tobii'),
                         ('PoG_cm_initial', 'PoG_cm_tobii'),
                         ('PoG_px_final', 'PoG_px_tobii'),
                         ('PoG_cm_final', 'PoG_cm_tobii')):
        if have(interm, pred_key) and have(full, gt):
            output['loss_mse_' + pred_key] = losses_lib.mse_loss(
                interm[pred_key], full[gt], full[gt + '_validity'])
            output['metric_euc_' + pred_key] = losses_lib.euclidean_loss(
                interm[pred_key], full[gt], full[gt + '_validity'])

    for pred_key in ('g_initial', 'g_final'):
        if have(interm, pred_key) and have(full, 'g'):
            output['metric_ang_' + pred_key] = losses_lib.angular_loss(
                interm[pred_key], full['g'], full['g_validity'])

    # Gated-readout diagnostics: the raw heatmap soft-argmax error (what
    # the final WOULD read under reference semantics) and the mean gate —
    # metrics only, never part of full_loss.
    if have(interm, 'PoG_px_heatmap_final') and have(full, 'PoG_px_tobii'):
        output['metric_euc_PoG_px_heatmap_final'] = \
            losses_lib.euclidean_loss(interm['PoG_px_heatmap_final'],
                                      full['PoG_px_tobii'],
                                      full['PoG_px_tobii_validity'])
    if have(interm, 'refine_gate'):
        output['metric_mean_refine_gate'] = jnp.mean(
            interm['refine_gate'].astype(jnp.float32))
