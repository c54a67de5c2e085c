"""Native framepack library vs numpy reference."""

import numpy as np
import pytest

from eve_tpu.data import framepack as fp


def test_native_builds():
    lib = fp.get_lib()
    if lib is None:
        pytest.skip('native framepack could not be built')


def test_eye_pack_matches_numpy(rng):
    frames = rng.randint(0, 256, (5, 16, 32, 3)).astype(np.uint8)
    l_ref, r_ref = fp.pack_eye_frames(frames, use_native=False)
    if fp.get_lib() is None:
        pytest.skip('no native lib')
    l_nat, r_nat = fp.pack_eye_frames(frames, use_native=True)
    np.testing.assert_allclose(l_nat, l_ref, atol=1e-6)
    np.testing.assert_allclose(r_nat, r_ref, atol=1e-6)
    # Semantics: left patch is the right half of the strip
    np.testing.assert_allclose(
        l_ref, frames[:, :, 16:, :].astype(np.float32) * 2 / 255 - 1,
        atol=1e-6)


def test_screen_pack_matches_numpy(rng):
    frames = rng.randint(0, 256, (4, 8, 12, 3)).astype(np.uint8)
    ref = fp.pack_screen_frames(frames, use_native=False)
    if fp.get_lib() is None:
        pytest.skip('no native lib')
    nat = fp.pack_screen_frames(frames, use_native=True)
    np.testing.assert_allclose(nat, ref, atol=1e-6)
    assert ref.min() >= 0.0 and ref.max() <= 1.0
