"""Pallas FPS kernel vs the XLA reference op (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from graspldm_tpu.ops import furthest_point_sample
from graspldm_tpu.ops.pallas_fps import furthest_point_sample_pallas


def test_pallas_fps_matches_xla_op():
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(2, 256, 3)).astype(np.float32)
    want = np.asarray(furthest_point_sample(jnp.asarray(coords), 64))
    got = np.asarray(
        furthest_point_sample_pallas(jnp.asarray(coords), 64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_small_m():
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(1, 128, 3)).astype(np.float32)
    want = np.asarray(furthest_point_sample(jnp.asarray(coords), 16))
    got = np.asarray(
        furthest_point_sample_pallas(jnp.asarray(coords), 16, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
