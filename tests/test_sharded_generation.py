"""Sharded (multi-chip) generation on the virtual 8-device CPU mesh.

The contract: :func:`make_sharded_ldm_generate` over a ``data`` axis of size
n produces EXACTLY the grasps of n independent per-chip
:func:`ldm_generate` calls on the B/n-object shards with
``fold_in(key, shard_index)`` — no collectives, no cross-chip coupling
(SURVEY.md §2.3: generation scales by sharding the B*G axis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspldm_tpu.flagship import FlagshipConfig, build_flagship
from graspldm_tpu.inference import (
    ldm_generate,
    make_sharded_ldm_generate,
    make_sharded_vae_generate,
    vae_generate,
)
from graspldm_tpu.parallel import make_mesh

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
    diffusion_timesteps=50,
)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (JAX_PLATFORMS=cpu + "
                    "xla_force_host_platform_device_count=8)")
    return make_mesh(devices=jax.devices()[:8])


@pytest.fixture(scope="module")
def models():
    vae, ddm, diffusion = build_flagship(TINY)
    rng = jax.random.PRNGKey(0)
    B, N, G = 8, 32, 2
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B * 2, 7))
    vae_vars = vae.init({"params": rng, "dropout": rng}, pc, grasps)
    x = jnp.zeros((2, 1, TINY.grasp_latent_size))
    t = jnp.zeros((2,), jnp.int32)
    zc = jnp.zeros((2, TINY.pc_latent_channels, TINY.pc_latent_size))
    ddm_vars = ddm.init({"params": rng, "dropout": rng}, x, t, zc)
    return vae, ddm, diffusion, vae_vars, ddm_vars, pc, G


def test_sharded_ldm_matches_per_shard_runs(mesh, models):
    vae, ddm, diffusion, vae_vars, ddm_vars, pc, G = models
    key = jax.random.PRNGKey(42)
    n = mesh.shape["data"]

    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=G, num_inference_steps=5,
        sampler="ddim", denoiser_impl="flax",
    )
    out = run(vae_vars, ddm_vars, pc, key)
    assert out["grasps"].shape == (pc.shape[0], G, 4, 4)
    assert out["grasps"].sharding.spec == jax.sharding.PartitionSpec("data")

    # per-chip reference: shard i runs unsharded with fold_in(key, i)
    shard = pc.shape[0] // n
    for i in (0, 3, 7):
        want = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion,
            pc[i * shard : (i + 1) * shard], G,
            jax.random.fold_in(key, i),
            num_inference_steps=5, sampler="ddim", denoiser_impl="flax",
        )
        np.testing.assert_allclose(
            np.asarray(out["grasps"][i * shard : (i + 1) * shard]),
            np.asarray(want["grasps"]),
            atol=2e-5, rtol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["confidence"][i * shard : (i + 1) * shard]),
            np.asarray(want["confidence"]),
            atol=2e-5, rtol=2e-5,
        )


def test_sharded_ldm_runtime_per_object_meta(mesh, models):
    """Per-object NormalizationMeta is a CALL-time argument sharded over
    the data axis: each chip unnormalizes with its own objects' stats
    (build-time meta is replicated, so it must be unbatched)."""
    from graspldm_tpu.utils.normalization import normalize_pc_and_grasps

    vae, ddm, diffusion, vae_vars, ddm_vars, pc, G = models
    key = jax.random.PRNGKey(11)
    n = mesh.shape["data"]
    B = pc.shape[0]
    # distinct per-object centers -> distinct per-object meta
    raw = pc + jnp.arange(B, dtype=pc.dtype)[:, None, None]
    pc_n, _, meta = normalize_pc_and_grasps(
        raw, jnp.zeros((B, 1, 6), pc.dtype)
    )

    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=G, num_inference_steps=3,
        sampler="ddim", denoiser_impl="flax",
    )
    out = run(vae_vars, ddm_vars, pc_n, key, meta=meta)

    shard = B // n
    i = 3
    want = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion,
        pc_n[i * shard : (i + 1) * shard], G,
        jax.random.fold_in(key, i),
        num_inference_steps=3, sampler="ddim", denoiser_impl="flax",
        meta=jax.tree.map(lambda l: l[i * shard : (i + 1) * shard], meta),
    )
    np.testing.assert_allclose(
        np.asarray(out["grasp_tmrp"][i * shard : (i + 1) * shard]),
        np.asarray(want["grasp_tmrp"]),
        atol=2e-5, rtol=2e-5,
    )

    # batched meta at BUILD time is rejected with a pointer to the runtime path
    with pytest.raises(ValueError, match="call time"):
        make_sharded_ldm_generate(
            mesh, vae, ddm, diffusion, num_grasps=G, meta=meta
        )


def test_sharded_vae_matches_per_shard_runs(mesh, models):
    vae, _, _, vae_vars, _, pc, G = models
    key = jax.random.PRNGKey(7)
    n = mesh.shape["data"]
    run = make_sharded_vae_generate(mesh, vae, num_grasps=G)
    out = run(vae_vars, pc, key)
    assert out["grasps"].shape == (pc.shape[0], G, 4, 4)

    shard = pc.shape[0] // n
    want = vae_generate(
        vae, vae_vars, pc[:shard], G, jax.random.fold_in(key, 0)
    )
    np.testing.assert_allclose(
        np.asarray(out["grasps"][:shard]), np.asarray(want["grasps"]),
        atol=2e-5, rtol=2e-5,
    )


def test_trajectory_decode(models):
    """`return_trajectory` yields the reference's all_diffusion_grasps:
    <=50 intermediate diffusion states decoded to [S', B, G, 4, 4] poses
    (`tools/inference.py:630-643`)."""
    vae, ddm, diffusion, vae_vars, ddm_vars, pc, G = models
    out = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:2], G,
        jax.random.PRNGKey(3), num_inference_steps=5, sampler="ddim",
        return_trajectory=True, denoiser_impl="flax",
    )
    traj = np.asarray(out["all_diffusion_grasps"])
    # 5 steps -> 6 states (x_T included), all under the 50-state cap
    assert traj.shape == (6, 2, G, 4, 4)
    assert np.isfinite(traj).all()
    # the final trajectory entry is the returned grasp set
    np.testing.assert_allclose(
        traj[-1], np.asarray(out["grasps"]), atol=1e-5
    )


def test_grasp_sharded_ldm_single_object(mesh, models):
    """shard="grasps": pc replicates, each chip samples G/n grasps —
    a SINGLE object's sampler work spreads over the mesh (the latency
    scale-out; `shard="objects"` covers throughput). Contract: the
    global grasp set is the concat of per-chip `ldm_generate` runs with
    `fold_in(key, chip)` on the grasp axis."""
    vae, ddm, diffusion, vae_vars, ddm_vars, pc, _ = models
    key = jax.random.PRNGKey(21)
    n = mesh.shape["data"]
    G = 2 * n
    pc1 = pc[:1]  # ONE object

    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=G, num_inference_steps=3,
        sampler="ddim", denoiser_impl="flax", shard="grasps",
    )
    out = run(vae_vars, ddm_vars, pc1, key)
    assert out["grasps"].shape == (1, G, 4, 4)
    assert out["confidence"].shape == (1, G)
    assert out["grasps"].sharding.spec == jax.sharding.PartitionSpec(
        None, "data"
    )

    gn = G // n
    for i in (0, 3, 7):
        want = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc1, gn,
            jax.random.fold_in(key, i),
            num_inference_steps=3, sampler="ddim", denoiser_impl="flax",
        )
        np.testing.assert_allclose(
            np.asarray(out["grasps"][:, i * gn : (i + 1) * gn]),
            np.asarray(want["grasps"]),
            atol=2e-5, rtol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["confidence"][:, i * gn : (i + 1) * gn]),
            np.asarray(want["confidence"]),
            atol=2e-5, rtol=2e-5,
        )


def test_grasp_sharded_vae_and_meta(mesh, models):
    """VAE mode with shard="grasps" + replicated per-object runtime meta:
    every chip unnormalizes all B objects with the same stats."""
    from graspldm_tpu.utils.normalization import normalize_pc_and_grasps

    vae, _, _, vae_vars, _, pc, _ = models
    key = jax.random.PRNGKey(13)
    n = mesh.shape["data"]
    G = 2 * n
    B = 2
    raw = pc[:B] + jnp.arange(B, dtype=pc.dtype)[:, None, None]
    pc_n, _, meta = normalize_pc_and_grasps(
        raw, jnp.zeros((B, 1, 6), pc.dtype)
    )

    run = make_sharded_vae_generate(
        mesh, vae, num_grasps=G, shard="grasps"
    )
    out = run(vae_vars, pc_n, key, meta=meta)
    assert out["grasps"].shape == (B, G, 4, 4)

    gn = G // n
    i = 2
    want = vae_generate(
        vae, vae_vars, pc_n, gn, jax.random.fold_in(key, i), meta=meta
    )
    np.testing.assert_allclose(
        np.asarray(out["grasp_tmrp"][:, i * gn : (i + 1) * gn]),
        np.asarray(want["grasp_tmrp"]),
        atol=2e-5, rtol=2e-5,
    )


@pytest.fixture(scope="module")
def cond_models():
    """Class-conditioned flagship for the CFG sharding tests."""
    import dataclasses

    cfg = dataclasses.replace(TINY, conditioning="class", cond_dropout=0.1)
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(5)
    B, N, G = 8, 32, 2
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B * G, 7))
    vae_vars = vae.init({"params": rng, "dropout": rng}, pc, grasps)
    x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
    t = jnp.zeros((B * G,), jnp.int32)
    zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
    ddm_vars = ddm.init(
        {"params": rng, "dropout": rng}, x, t, zc, jnp.zeros((B * G,))
    )
    return vae, ddm, diffusion, vae_vars, ddm_vars, pc, G


def test_sharded_cfg_matches_per_shard_runs(mesh, cond_models):
    """CFG in the sharded path (VERDICT r4 #9): cls_cond shards with the
    object axis and each chip's doubled-batch CFG run equals the unsharded
    `ldm_generate(cfg_scale=...)` on its cond slice."""
    vae, ddm, diffusion, vae_vars, ddm_vars, pc, G = cond_models
    key = jax.random.PRNGKey(17)
    n = mesh.shape["data"]
    B = pc.shape[0]
    cls_cond = jnp.tile(
        jnp.arange(B, dtype=jnp.float32)[:, None] % 2.0, (1, G)
    )

    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=G, num_inference_steps=4,
        sampler="ddim", denoiser_impl="flax", cfg_scale=2.5,
    )
    out = run(vae_vars, ddm_vars, pc, key, cls_cond=cls_cond)
    assert out["grasps"].shape == (B, G, 4, 4)

    shard = B // n
    for i in (0, 5):
        want = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion,
            pc[i * shard : (i + 1) * shard], G,
            jax.random.fold_in(key, i),
            num_inference_steps=4, sampler="ddim", denoiser_impl="flax",
            cfg_scale=2.5,
            cls_cond=cls_cond[i * shard : (i + 1) * shard].reshape(-1),
        )
        np.testing.assert_allclose(
            np.asarray(out["grasps"][i * shard : (i + 1) * shard]),
            np.asarray(want["grasps"]),
            atol=2e-5, rtol=2e-5,
        )

    # conditioning actually matters: flipping the labels changes the grasps
    out_flipped = run(vae_vars, ddm_vars, pc, key, cls_cond=1.0 - cls_cond)
    assert not np.allclose(
        np.asarray(out["grasps"]), np.asarray(out_flipped["grasps"])
    )


def test_grasp_sharded_cfg_shards_cond_on_grasp_axis(mesh, cond_models):
    """shard="grasps" + CFG: pc replicates while cls_cond's GRASP axis
    shards — each chip conditions exactly the G/n grasps it samples."""
    vae, ddm, diffusion, vae_vars, ddm_vars, pc, _ = cond_models
    key = jax.random.PRNGKey(19)
    n = mesh.shape["data"]
    G = 2 * n
    pc1 = pc[:1]
    # distinct label per grasp so a mis-sharded cond would be visible
    cls_cond = (jnp.arange(G, dtype=jnp.float32)[None] % 2.0)

    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=G, num_inference_steps=3,
        sampler="ddim", denoiser_impl="flax", cfg_scale=2.0,
        shard="grasps",
    )
    out = run(vae_vars, ddm_vars, pc1, key, cls_cond=cls_cond)
    assert out["grasps"].shape == (1, G, 4, 4)

    gn = G // n
    for i in (0, 7):
        want = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc1, gn,
            jax.random.fold_in(key, i),
            num_inference_steps=3, sampler="ddim", denoiser_impl="flax",
            cfg_scale=2.0,
            cls_cond=cls_cond[:, i * gn : (i + 1) * gn].reshape(-1),
        )
        np.testing.assert_allclose(
            np.asarray(out["grasps"][:, i * gn : (i + 1) * gn]),
            np.asarray(want["grasps"]),
            atol=2e-5, rtol=2e-5,
        )


def test_cond_validation(mesh, models, cond_models):
    vae_u, ddm_u, diffusion_u, vae_vars_u, _, pc, G = models
    # VAE runner rejects conditioning tensors
    run_vae = make_sharded_vae_generate(mesh, vae_u, num_grasps=G)
    with pytest.raises(ValueError, match="LDM"):
        run_vae(vae_vars_u, pc, jax.random.PRNGKey(0),
                cls_cond=jnp.zeros((pc.shape[0], G)))
    # cond without the [B, G, ...] layout is rejected
    vae, ddm, diffusion, vae_vars, ddm_vars, pc_c, Gc = cond_models
    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=Gc, num_inference_steps=2,
        denoiser_impl="flax", cfg_scale=2.0,
    )
    with pytest.raises(ValueError, match="leading dims"):
        run(vae_vars, ddm_vars, pc_c, jax.random.PRNGKey(0),
            cls_cond=jnp.zeros((pc_c.shape[0] * Gc,)))


def test_grasp_shard_validation(mesh, models):
    vae, ddm, diffusion, *_ = models
    n = mesh.shape["data"]
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_ldm_generate(
            mesh, vae, ddm, diffusion, num_grasps=n + 1, shard="grasps"
        )
    with pytest.raises(ValueError, match="objects.*grasps"):
        make_sharded_vae_generate(mesh, vae, num_grasps=n, shard="spam")
