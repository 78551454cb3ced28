"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4).

Keeps models tiny (the 1-CPU test host compiles slowly); the full-size
multi-chip path is exercised by `__graft_entry__.dryrun_multichip`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from graspldm_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip(
            "needs 8 virtual devices: run pytest with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 in the SHELL "
            "env (an interpreter-startup hook may initialize jax before "
            "conftest can set them)"
        )
    return make_mesh(devices=jax.devices()[:8])


class TestMesh:
    def test_devices(self, mesh):
        assert mesh.shape == {"data": 8}

    def test_shard_batch_layout(self, mesh):
        batch = {"x": np.zeros((16, 4), np.float32)}
        out = shard_batch(batch, mesh)
        sh = out["x"].sharding
        assert sh.spec == P("data")
        assert len(out["x"].addressable_shards) == 8
        assert out["x"].addressable_shards[0].data.shape == (2, 4)

    def test_replicate(self, mesh):
        params = {"w": np.ones((3, 3), np.float32)}
        out = replicate(params, mesh)
        assert out["w"].sharding.spec == P()


class TestDataParallelStep:
    def test_grad_allreduce_matches_single_device(self, mesh):
        """A jitted sharded loss-grad equals the unsharded computation."""

        def loss_fn(w, x):
            return jnp.mean((x @ w) ** 2)

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

        g_single = jax.grad(loss_fn)(w, x)

        w_r = jax.device_put(w, NamedSharding(mesh, P()))
        x_s = jax.device_put(x, batch_sharding(mesh))
        g_sharded = jax.jit(jax.grad(loss_fn))(w_r, x_s)

        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_single), atol=1e-6
        )

    def test_sharded_sampler_batch(self, mesh):
        """The diffusion sampler runs with the B*G axis sharded over chips."""
        from graspldm_tpu.diffusion import DiffusionSchedule, GaussianDiffusion1D

        s = DiffusionSchedule.create(50, "linear", 1e-4, 2e-2)
        diff = GaussianDiffusion1D(schedule=s, n_dims=3)

        w = jax.device_put(
            jnp.ones((3, 3), jnp.float32), NamedSharding(mesh, P())
        )

        def denoise(x, t, z):
            return jnp.einsum("bcd,de->bce", x, w)

        @jax.jit
        def run(key):
            x0, _ = diff.sample(denoise, key, 16, None, num_inference_steps=5,
                                sampler="ddim")
            return x0

        out = run(jax.random.PRNGKey(0))
        assert out.shape == (16, 1, 3)
        assert np.all(np.isfinite(np.asarray(out)))


class TestPrefetch:
    def test_prefetch_yields_all_batches(self, mesh):
        import numpy as np

        from graspldm_tpu.parallel import prefetch_to_device

        batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2, mesh=mesh))
        assert len(out) == 5
        for i, b in enumerate(out):
            assert float(b["x"][0, 0]) == i
            assert b["x"].sharding.spec == jax.sharding.PartitionSpec("data")

    def test_prefetch_without_mesh(self):
        import numpy as np

        from graspldm_tpu.parallel import prefetch_to_device

        batches = [{"x": np.ones((4,), np.float32)}]
        out = list(prefetch_to_device(iter(batches)))
        assert len(out) == 1


class TestMultiSliceMesh:
    """2-axis ("dcn", "data") mesh — the multi-slice topology (SURVEY §2.3).

    Data-parallel batches shard over BOTH axes; gradients all-reduce over
    dcn+ici exactly like the 1-D mesh, so losses must match bitwise-ish.
    """

    @pytest.fixture(scope="class")
    def mesh2d(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        return make_mesh(
            devices=jax.devices()[:8],
            axis_names=("dcn", "data"),
            shape=(2, 4),
        )

    def test_shape(self, mesh2d):
        assert mesh2d.shape == {"dcn": 2, "data": 4}

    def test_grad_parity_with_1d_mesh(self, mesh2d, mesh):
        def loss_fn(w, x):
            return jnp.mean((x @ w) ** 2)

        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

        g_1d = jax.jit(jax.grad(loss_fn))(
            jax.device_put(w, NamedSharding(mesh, P())),
            jax.device_put(x, NamedSharding(mesh, P("data"))),
        )
        g_2d = jax.jit(jax.grad(loss_fn))(
            jax.device_put(w, NamedSharding(mesh2d, P())),
            jax.device_put(x, NamedSharding(mesh2d, P(("dcn", "data")))),
        )
        np.testing.assert_allclose(np.asarray(g_2d), np.asarray(g_1d), atol=1e-6)

    @pytest.mark.slow
    def test_train_steps_both_stages_on_2d_mesh(self, mesh2d):
        """One VAE and one DDM train step, batch sharded over (dcn, data);
        losses match the unsharded step (VERDICT round-1 item 8)."""
        from graspldm_tpu.flagship import FlagshipConfig, build_flagship
        from graspldm_tpu.training import (
            init_train_state,
            make_ddm_train_step,
            make_vae_train_step,
        )
        from graspldm_tpu.training.optim import build_optimizer

        cfg = FlagshipConfig(
            pc_num_points=32,
            pc_latent_size=8,
            pc_latent_channels=3,
            grasp_latent_size=4,
            block_channels=(8, 16),
            resnet_block_groups=4,
            dropout=None,
            pc_scale_channels=0.25,
            pc_scale_voxel_resolution=0.25,
            diffusion_timesteps=50,
        )
        vae, ddm, diffusion = build_flagship(cfg)
        tx = build_optimizer(1e-3)
        rng = jax.random.PRNGKey(0)
        B, G, N = 8, 2, 32
        pc = jax.random.normal(rng, (B, N, 3))
        grasps = jax.random.normal(rng, (B, G, 7))
        batch = {"pc": pc, "grasps": grasps}

        vae_state = init_train_state(
            vae, tx, rng, (pc, grasps.reshape(-1, 7)), {"rng": rng}
        )
        vae_step = jax.jit(make_vae_train_step(vae, tx, ema_cfg=None))
        _, m_plain = vae_step(vae_state, batch, rng)

        repl = NamedSharding(mesh2d, P())
        data2 = NamedSharding(mesh2d, P(("dcn", "data")))
        state_s = jax.device_put(vae_state, repl)
        batch_s = {k: jax.device_put(v, data2) for k, v in batch.items()}
        state_s2, m_sharded = vae_step(state_s, batch_s, rng)
        np.testing.assert_allclose(
            float(m_sharded["loss"]), float(m_plain["loss"]), rtol=1e-5
        )

        # stage 2 on the same 2-axis mesh
        vae_vars = {"params": vae_state.params}
        if vae_state.batch_stats is not None:
            vae_vars["batch_stats"] = vae_state.batch_stats
        x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
        t = jnp.zeros((B * G,), jnp.int32)
        zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
        ddm_state = init_train_state(ddm, tx, rng, (x, t, zc))
        ddm_step = jax.jit(make_ddm_train_step(vae, ddm, diffusion, tx,
                                               ema_cfg=None))
        _, md_plain = ddm_step(ddm_state, batch, rng, vae_vars)
        _, md_sharded = ddm_step(
            jax.device_put(ddm_state, repl),
            batch_s,
            rng,
            jax.device_put(vae_vars, repl),
        )
        np.testing.assert_allclose(
            float(md_sharded["loss"]), float(md_plain["loss"]), rtol=1e-5
        )
