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
