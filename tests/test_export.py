"""AOT export (jax.export) round-trip tests.

Pins the deployment contract of :mod:`graspldm_tpu.serving.export`: an
exported generation program, serialized to bytes and deserialized with no
reference to the model objects, produces bitwise the same results as the
live jitted pipeline for the same (pc, seed, meta) inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspldm_tpu.flagship import FlagshipConfig, build_flagship
from graspldm_tpu.serving.export import (
    export_program,
    load_exported,
    make_ldm_program,
    make_vae_program,
    save_exported,
)
from graspldm_tpu.utils.normalization import NormalizationMeta

TINY = FlagshipConfig(
    pc_num_points=32,
    pc_latent_size=8,
    pc_latent_channels=3,
    grasp_latent_size=4,
    block_channels=(8, 16),
    resnet_block_groups=4,
    dropout=None,
    pc_scale_channels=0.25,
    pc_scale_voxel_resolution=0.25,
    diffusion_timesteps=20,
)
B, N, G = 2, 32, 4


@pytest.fixture(scope="module")
def tiny():
    vae, ddm, diffusion = build_flagship(TINY)
    rng = jax.random.PRNGKey(0)
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (2 * 3, 7))
    vae_vars = jax.jit(lambda k: vae.init({"params": k}, pc, grasps))(rng)
    x = jnp.zeros((2, 1, TINY.grasp_latent_size))
    t = jnp.zeros((2,), jnp.int32)
    zc = jnp.zeros((2, 3, TINY.pc_latent_size))
    ddm_vars = jax.jit(lambda k: ddm.init({"params": k}, x, t, zc))(rng)
    return vae, vae_vars, ddm, ddm_vars, diffusion, pc


def _meta():
    return NormalizationMeta(
        pc_mean=jnp.arange(B * 3, dtype=jnp.float32).reshape(B, 3) * 0.01,
        pc_std=jnp.full((B, 3), 0.05),
        grasp_mean=jnp.zeros((B, 6)).at[:, :3].set(0.02),
        grasp_std=jnp.asarray([[0.05] * 3 + [0.5] * 3] * B),
    )


def _assert_same(res, ref):
    assert set(res.keys()) == set(ref.keys())
    for k in ref:
        np.testing.assert_array_equal(np.asarray(res[k]), np.asarray(ref[k]))


def test_vae_export_roundtrip(tiny, tmp_path):
    vae, vae_vars, *_ , pc = tiny
    fn = make_vae_program(vae, vae_vars, num_grasps=G)
    meta = _meta()
    seed = jnp.uint32(7)
    ref = jax.jit(fn)(pc, seed, meta)
    assert ref["grasps"].shape == (B, G, 4, 4)

    exported = export_program(fn, B, N)
    path = tmp_path / "vae.jaxexp"
    save_exported(exported, str(path))
    prog = load_exported(str(path))
    assert prog.in_avals  # signature survives serialization
    res = prog.call(pc, seed, meta)
    _assert_same(res, ref)


def test_ldm_export_roundtrip_no_meta(tiny, tmp_path):
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = tiny
    fn = make_ldm_program(
        vae, vae_vars, ddm, ddm_vars, diffusion,
        num_grasps=G, num_inference_steps=5, sampler="ddim",
        with_meta=False,
    )
    seed = jnp.uint32(3)
    ref = jax.jit(fn)(pc, seed)
    exported = export_program(fn, B, N, with_meta=False)
    path = tmp_path / "ldm.jaxexp"
    save_exported(exported, str(path))
    prog = load_exported(str(path))
    res = prog.call(pc, seed)
    _assert_same(res, ref)
    # normalized-units program: confidence still a [B, G] probability map
    conf = np.asarray(res["confidence"])
    assert conf.shape == (B, G) and (conf >= 0).all() and (conf <= 1).all()
