"""Systematic gradient-finiteness sweep over the public ops/losses layer.

One parametrized test: ``jax.grad`` of every public geometry / heatmap op and
every loss must be finite over a grid of adversarial inputs — zero vectors
(padded frames), pitch poles, zero/identity rotations, rays parallel to the
screen plane, saturated heatmaps (exact 0.0 / 1.0), identical predictions
(cosine similarity == 1, the zero-init-head case), all-invalid and
single-valid frames, zero timestamps. The hand-picked NaN-safety fixes
(``ops/geometry.py:_safe_norm``, the ``vector_to_pitchyaw`` frontal swap, the
loss double-where guards — reference semantics
/root/reference/src/models/common.py:32-323) are here pinned exhaustively:
any NEW NaN path in an exported op fails this file.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eve_tpu import losses as losses_lib
from eve_tpu.ops import geometry as geo
from eve_tpu.ops import heatmap as hm


# ---------------------------------------------------------------------------
# Adversarial input banks (float32 numpy; shapes small enough for CPU grad)
# ---------------------------------------------------------------------------

def _vec3_bank():
    return {
        'zero': np.zeros((4, 3)),
        'tiny': np.full((4, 3), 1e-20),
        'unit_z': np.tile([0.0, 0.0, 1.0], (4, 1)),
        'pole_y': np.tile([0.0, 1.0, 0.0], (4, 1)),  # pitch +-pi/2 direction
        'neg_pole': np.tile([0.0, -1.0, 0.0], (4, 1)),
        'mixed': np.array([[0, 0, 0], [0, 1, 0], [1e-12, -1e-12, 0],
                           [-0.3, 0.4, -0.8]]),
    }


def _py_bank():
    hp = np.pi / 2
    return {
        'zero': np.zeros((4, 2)),
        'poles': np.array([[hp, 0], [-hp, 0], [hp, np.pi], [-hp, -np.pi]]),
        'large': np.array([[10.0, -10.0], [3.0, 3.0], [0, np.pi], [-hp, hp]]),
    }


def _rot_bank():
    eye = np.tile(np.eye(3), (4, 1, 1))
    zero = np.zeros((4, 3, 3))  # padded frames carry all-zero rotations
    rng = np.random.RandomState(0)
    rand = np.asarray(geo.rodrigues(jnp.asarray(
        rng.randn(4, 3).astype(np.float32))))
    return {'identity': eye, 'zero': zero, 'random': rand}


def _heatmap_bank():
    ones = np.ones((2, 3, 9, 16))
    zeros = np.zeros((2, 3, 9, 16))
    onehot = np.zeros((2, 3, 9, 16))
    onehot[..., 4, 8] = 1.0
    uniform = np.full((2, 3, 9, 16), 0.5)
    return {'saturated_one': ones, 'saturated_zero': zeros,
            'onehot': onehot, 'uniform': uniform}


def _validity_bank():
    return {
        'all_valid': np.ones((2, 3)),
        'all_invalid': np.zeros((2, 3)),
        'single_valid': np.array([[1, 0, 0], [0, 0, 0]], np.float32),
    }


def _grad_ok(fn, *diff_args, **kwargs):
    """Assert value AND gradient of sum(fn(*diff_args)) are finite."""
    diff_args = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), tuple(diff_args))

    def scalar(args):
        out = fn(*args, **kwargs)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(out))

    val, grads = jax.value_and_grad(scalar)(diff_args)
    assert bool(jnp.isfinite(val)), 'non-finite VALUE: %r' % val
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert bool(jnp.all(jnp.isfinite(leaf))), (
            'non-finite GRADIENT at %s' % jax.tree_util.keystr(path))


# ---------------------------------------------------------------------------
# Case table: every public op x every relevant adversarial bank entry
# ---------------------------------------------------------------------------

CASES = []


def _case(name, fn, *args, **kwargs):
    CASES.append(pytest.param(fn, args, kwargs, id=name))


for k, v in _py_bank().items():
    _case('pitchyaw_to_vector/' + k, geo.pitchyaw_to_vector, v)
    _case('pitchyaw_to_rotation/' + k, geo.pitchyaw_to_rotation, v)
for k, v in _vec3_bank().items():
    _case('pitchyaw_to_vector3/' + k, geo.pitchyaw_to_vector, v)
    _case('vector_to_pitchyaw/' + k, geo.vector_to_pitchyaw, v)
for k, v in _rot_bank().items():
    _case('rotation_to_vector/' + k, geo.rotation_to_vector, v)

_T4 = np.tile(np.eye(4), (4, 1, 1))
_T0 = np.zeros((4, 4, 4))
for tk, T in (('identity', _T4), ('zero', _T0)):
    for vk, v in list(_vec3_bank().items())[:3]:
        _case(f'apply_transformation/{tk}-{vk}', geo.apply_transformation, T, v)
        _case(f'apply_rotation/{tk}-{vk}', geo.apply_rotation, T, v)

# Rays parallel to the z=0 plane (denominator -> eps), zero origins.
_case('intersect/parallel_ray', geo.get_intersect_with_zero,
      np.tile([0.0, 0.0, 500.0], (4, 1)), np.tile([1.0, 0.0, 0.0], (4, 1)))
_case('intersect/zero_all', geo.get_intersect_with_zero,
      np.zeros((4, 3)), np.zeros((4, 3)))
_case('intersect/near_parallel', geo.get_intersect_with_zero,
      np.tile([10.0, -5.0, 300.0], (4, 1)), np.tile([0.7, 0.7, -1e-9], (4, 1)))

for rk, R in _rot_bank().items():
    for pk, p in _py_bank().items():
        _case(f'to_screen/{rk}-{pk}',
              lambda o, d, rot, T, ppm: geo.to_screen_coordinates(
                  o, d, rot, {'inv_camera_transformation': T,
                              'pixels_per_millimeter': ppm}),
              np.zeros((4, 3)), p, R, _T4, np.full((4, 2), 3.6))
        _case(f'offset_aug/{rk}-{pk}', geo.apply_offset_augmentation,
              p, R, np.zeros((4, 2)))
    _case(f'combined_gaze/{rk}', geo.calculate_combined_gaze_direction,
          np.zeros((4, 3)), np.zeros((4, 2)), R, _T4)

for k, v in _vec3_bank().items():
    _case('rodrigues/' + k, geo.rodrigues, v)

for k, v in _py_bank().items():
    _case('angular_error/identical-' + k, geo.angular_error_degrees, v, v)
_case('angular_error/opposite', geo.angular_error_degrees,
      np.tile([0.0, 0.0], (4, 1)), np.tile([0.0, np.pi], (4, 1)))
_case('angular_error/zero3d', geo.angular_error_degrees,
      np.zeros((4, 3)), np.zeros((4, 3)))

# Heatmap ops.
_case('make_heatmaps/corner', hm.make_heatmaps, np.zeros((2, 3, 2)),
      sigma=3.0, heatmap_size=(16, 9))
_case('make_heatmaps/offscreen', hm.make_heatmaps,
      np.full((2, 3, 2), -5000.0), sigma=3.0, heatmap_size=(16, 9))
for k, v in _heatmap_bank().items():
    _case('soft_argmax/' + k, hm.soft_argmax, v, heatmap_size=(16, 9))

_ts = np.array([[1e9, 2e9, 3e9], [1e9, 0, 0]], np.float32)
for vk, val in _validity_bank().items():
    _case('history_scan/' + vk, hm.decayed_history_scan,
          _heatmap_bank()['onehot'], _ts, val)
_case('history_scan/all_padded', hm.decayed_history_scan,
      _heatmap_bank()['uniform'], np.zeros((2, 3), np.float32),
      np.ones((2, 3), np.float32))

# Losses: every loss x validity bank x (identical | saturated) predictions.
_pred = np.array([[[1.0, 2.0], [0.0, 0.0], [3.0, -4.0]],
                  [[0.0, 0.0], [5.0, 5.0], [-1.0, 2.0]]], np.float32)
for vk, val in _validity_bank().items():
    for loss_name, loss_fn in (('mse', losses_lib.mse_loss),
                               ('l1', losses_lib.l1_loss),
                               ('euclidean', losses_lib.euclidean_loss),
                               ('angular', losses_lib.angular_loss)):
        _case(f'{loss_name}/{vk}-identical', loss_fn, _pred, _pred, val)
        _case(f'{loss_name}/{vk}-distinct', loss_fn, _pred, 2 * _pred + 1, val)
    for hk in ('saturated_one', 'saturated_zero', 'onehot'):
        _case(f'cross_entropy/{vk}-{hk}', losses_lib.cross_entropy_loss,
              _heatmap_bank()[hk], _heatmap_bank()['onehot'], val)
_case('masked_mean/all_invalid', losses_lib.masked_mean,
      np.ones((2, 3), np.float32), np.zeros((2, 3), np.float32))


@pytest.mark.parametrize('fn,args,kwargs', CASES)
def test_grad_finite(fn, args, kwargs):
    _grad_ok(fn, *args, **kwargs)


def test_sweep_covers_every_public_op():
    """The sweep must name every exported op/loss — a new public op without
    an adversarial-grad case fails here, not silently."""
    covered = {p.id.split('/')[0] for p in CASES}
    # Aliases: pitchyaw_to_vector3 exercises the 3D branch of
    # pitchyaw_to_vector; to_screen/offset_aug/combined_gaze map below.
    alias = {
        'pitchyaw_to_vector3': 'pitchyaw_to_vector',
        'to_screen': 'to_screen_coordinates',
        'offset_aug': 'apply_offset_augmentation',
        'combined_gaze': 'calculate_combined_gaze_direction',
        'intersect': 'get_intersect_with_zero',
        'angular_error': 'angular_error_degrees',
        'history_scan': 'decayed_history_scan',
        'mse': 'mse_loss', 'l1': 'l1_loss', 'euclidean': 'euclidean_loss',
        'angular': 'angular_loss', 'cross_entropy': 'cross_entropy_loss',
    }
    covered = {alias.get(c, c) for c in covered}

    import inspect
    want = set()
    for mod, skip in ((geo, {'rodrigues'}), (hm, set()),
                      (losses_lib, set())):
        for name, obj in vars(mod).items():
            if (name.startswith('_') or not inspect.isfunction(obj)
                    or obj.__module__ != mod.__name__):
                continue
            want.add(name)
    want.add('rodrigues')
    # Wrappers/dispatchers with no independent math: the *_fast variants
    # dispatch to the XLA formulations tested above (Pallas path is
    # TPU-only and value-pinned in test_pallas_kernels.py); history_update
    # is the scanned body of decayed_history_scan; make_heatmaps is
    # exercised directly.
    want -= {'make_heatmaps_fast', 'soft_argmax_fast', 'history_update'}
    missing = want - covered
    assert not missing, 'public ops without a grad-finiteness case: %s' % (
        sorted(missing),)
