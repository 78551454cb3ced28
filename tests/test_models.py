"""Model module tests (tiny shapes; CPU-jit budget conscious)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspldm_tpu.models import GraspCVAE, GraspLatentDDM


@pytest.fixture(scope="module")
def tiny_vae():
    # small voxel resolutions: conv3d compiles on the 1-CPU test host are the
    # bottleneck; the flagship resolutions are exercised on TPU via bench.py
    # and __graft_entry__.
    vae = GraspCVAE(pc_num_points=64, pc_scale_voxel_resolution=0.25)
    key = jax.random.PRNGKey(0)
    pc = jax.random.normal(key, (2, 64, 3))
    grasps = jax.random.normal(key, (2 * 3, 7))
    variables = jax.jit(lambda k: vae.init({"params": k}, pc, grasps))(key)
    return vae, variables, pc, grasps


class TestGraspCVAE:
    def test_shapes(self, tiny_vae):
        vae, variables, pc, grasps = tiny_vae
        key = jax.random.PRNGKey(1)
        (out, (mu, logvar)) = vae.apply(variables, pc, grasps, rng=key)
        tmrp, cls = out
        assert tmrp.shape == (6, 6)
        assert cls.shape == (6, 1)
        assert mu.shape == (6, 4) and logvar.shape == (6, 4)

    def test_zpc_shape(self, tiny_vae):
        vae, variables, pc, _ = tiny_vae
        z_pc = vae.apply(variables, pc, method="encode_pc")
        assert z_pc.shape == (2, 3, 64)

    def test_generate(self, tiny_vae):
        vae, variables, pc, _ = tiny_vae
        out = vae.apply(
            variables, pc, 5, rng=jax.random.PRNGKey(2), method="generate"
        )
        assert out[0].shape == (10, 6)

    def test_train_mode_updates_batch_stats(self, tiny_vae):
        vae, variables, pc, grasps = tiny_vae
        key = jax.random.PRNGKey(3)
        (_, _), updates = vae.apply(
            variables,
            pc,
            grasps,
            rng=key,
            train=True,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        assert "batch_stats" in updates
        # running means must have moved away from init zeros somewhere
        leaves = jax.tree.leaves(updates["batch_stats"])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestGraspLatentDDM:
    def test_denoiser_io(self):
        ddm = GraspLatentDDM()
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 1, 4))
        t = jnp.array([0, 10, 500, 999], jnp.int32)
        zc = jax.random.normal(key, (4, 3, 64))
        variables = ddm.init({"params": key}, x, t, zc)
        eps = ddm.apply(variables, x, t, zc)
        assert eps.shape == (4, 1, 4)
        assert np.all(np.isfinite(np.asarray(eps)))
        # random fourier weights live in constants (frozen)
        assert "constants" in variables

    def test_time_dependence(self):
        ddm = GraspLatentDDM()
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (2, 1, 4))
        zc = jax.random.normal(key, (2, 3, 64))
        variables = ddm.init(
            {"params": key}, x, jnp.zeros((2,), jnp.int32), zc
        )
        a = ddm.apply(variables, x, jnp.zeros((2,), jnp.int32), zc)
        b = ddm.apply(variables, x, jnp.full((2,), 900, jnp.int32), zc)
        assert float(jnp.abs(a - b).max()) > 1e-6


class TestClassifier:
    def test_classifier_forward(self):
        from graspldm_tpu.models.grasp_classifier import PointsBasedGraspClassifier

        key = jax.random.PRNGKey(0)
        B, Np, Ng = 2, 48, 16
        model = PointsBasedGraspClassifier(
            num_pc_points=Np + Ng, scale_voxel_resolution=0.25
        )
        pc = jax.random.normal(key, (B, Np, 3))
        gp = jax.random.normal(key, (B, Ng, 3))
        variables = model.init({"params": key}, pc, gp)
        logits = model.apply(variables, pc, gp)
        assert logits.shape == (B,)
        assert np.all(np.isfinite(np.asarray(logits)))
