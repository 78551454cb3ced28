"""Guided sampling in latent space (BASELINE configs[4], absent upstream):

* conditioning dropout (``cond_mask`` / ``cond_dropout``) — the training
  half of classifier-free guidance;
* CFG sampling (``ldm_generate(cfg_scale=...)``) on the flax and stacked
  denoiser paths;
* decoder-success guidance (``guidance_scale`` /
  ``graspldm_tpu.diffusion.guidance.make_success_guidance``) on the DDPM/
  DDIM and elucidated samplers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspldm_tpu.flagship import FlagshipConfig, build_flagship
from graspldm_tpu.inference.pipeline import ldm_generate
from graspldm_tpu.training import init_train_state, make_ddm_train_step
from graspldm_tpu.training.optim import build_optimizer
from graspldm_tpu.training.trainer import _conditioning_example

TINY = dict(
    pc_num_points=64,
    pc_latent_size=16,
    pc_latent_channels=3,
    grasp_latent_size=4,
    grasp_representation_dims=7,
    block_channels=(8, 16),
    resnet_block_groups=4,
    dropout=0.1,
    pc_scale_channels=0.25,
    pc_scale_voxel_resolution=0.25,
    diffusion_timesteps=50,
    beta_start=5e-5,
    beta_end=1e-3,
)


def _init_models(cfg, B=2, G=4, N=64, seed=0):
    """(vae, vae_vars, ddm, ddm_vars, diffusion, pc) with random weights."""
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(seed)
    tx = build_optimizer(1e-3)
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B, G, 7))
    vae_state = init_train_state(
        vae, tx, rng, (pc, grasps.reshape(-1, 7)), {"rng": rng}
    )
    vae_vars = {"params": vae_state.params}
    if vae_state.batch_stats is not None:
        vae_vars["batch_stats"] = vae_state.batch_stats

    x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
    t = jnp.zeros((B * G,), jnp.int32)
    zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
    args = (x, t, zc) + _conditioning_example(cfg, B * G)
    ddm_state = init_train_state(ddm, tx, rng, args)
    ddm_vars = {"params": ddm_state.params}
    if ddm_state.constants is not None:
        ddm_vars["constants"] = ddm_state.constants
    return vae, vae_vars, ddm, ddm_vars, diffusion, pc


def test_cond_mask_zero_removes_class_dependence():
    cfg = FlagshipConfig(**TINY, conditioning="class")
    _, _, ddm, ddm_vars, _, _ = _init_models(cfg)
    rng = jax.random.PRNGKey(1)
    BG = 8
    x = jax.random.normal(rng, (BG, 1, cfg.grasp_latent_size))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(rng, (BG, cfg.pc_latent_channels, cfg.pc_latent_size))
    cls_a = jnp.zeros((BG,))
    cls_b = jnp.full((BG,), 5.0)

    # mask = 0 kills the dependence on the class value entirely
    zeros = jnp.zeros((BG,))
    ea = ddm.apply(ddm_vars, x, t, zc, cls_a, cond_mask=zeros)
    eb = ddm.apply(ddm_vars, x, t, zc, cls_b, cond_mask=zeros)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), atol=0)

    # mask = 1 is a no-op; the two class values differ without masking
    ones = jnp.ones((BG,))
    np.testing.assert_allclose(
        np.asarray(ddm.apply(ddm_vars, x, t, zc, cls_b, cond_mask=ones)),
        np.asarray(ddm.apply(ddm_vars, x, t, zc, cls_b)),
        atol=0,
    )
    assert (
        float(
            jnp.abs(
                ddm.apply(ddm_vars, x, t, zc, cls_a)
                - ddm.apply(ddm_vars, x, t, zc, cls_b)
            ).max()
        )
        > 1e-6
    )


def test_cond_mask_region_model():
    cfg = FlagshipConfig(**TINY, conditioning="region", region_num_points=8)
    _, _, ddm, ddm_vars, _, _ = _init_models(cfg)
    rng = jax.random.PRNGKey(2)
    BG = 4
    x = jax.random.normal(rng, (BG, 1, cfg.grasp_latent_size))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(rng, (BG, cfg.pc_latent_channels, cfg.pc_latent_size))
    r0 = jnp.zeros((BG, 8, 3))
    r1 = jnp.ones((BG, 8, 3))
    zeros = jnp.zeros((BG,))
    np.testing.assert_allclose(
        np.asarray(ddm.apply(ddm_vars, x, t, zc, r0, cond_mask=zeros)),
        np.asarray(ddm.apply(ddm_vars, x, t, zc, r1, cond_mask=zeros)),
        atol=0,
    )


def test_cfg_scale_one_matches_conditional():
    """w = 1 collapses CFG to plain conditional sampling."""
    cfg = FlagshipConfig(**TINY, conditioning="class")
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(3)
    kwargs = dict(
        num_inference_steps=5,
        cls_cond=jnp.ones((4,)),
        denoiser_impl="flax",
        decoder_impl="flax",
    )
    plain = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng, **kwargs
    )
    cfg1 = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng,
        cfg_scale=1.0, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(cfg1["grasp_tmrp"]),
        np.asarray(plain["grasp_tmrp"]),
        atol=1e-5,
    )


def test_cfg_stacked_matches_flax():
    """The stacked kernel CFG path (halved extra_emb) equals the flax
    cond_mask path."""
    cfg = FlagshipConfig(**TINY, conditioning="class")
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(4)
    kwargs = dict(
        num_inference_steps=5,
        cls_cond=jnp.full((4,), 2.0),
        cfg_scale=3.0,
        decoder_impl="flax",
    )
    a = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng,
        denoiser_impl="flax", **kwargs
    )
    b = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng,
        denoiser_impl="stacked", **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(a["grasp_tmrp"]), np.asarray(b["grasp_tmrp"]),
        atol=2e-4, rtol=1e-4,
    )
    # w > 1 actually changes the samples vs plain conditional
    plain = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng,
        num_inference_steps=5, cls_cond=jnp.full((4,), 2.0),
        denoiser_impl="flax", decoder_impl="flax",
    )
    assert (
        float(np.abs(a["grasp_tmrp"] - plain["grasp_tmrp"]).max()) > 1e-5
    )


def test_cfg_requires_conditioning():
    cfg = FlagshipConfig(**TINY)
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    with pytest.raises(ValueError, match="cfg_scale requires"):
        ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 2,
            jax.random.PRNGKey(0), num_inference_steps=2, cfg_scale=2.0,
        )


def test_zero_guidance_fn_is_exact_noop():
    cfg = FlagshipConfig(**TINY)
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(5)
    kwargs = dict(num_inference_steps=5, denoiser_impl="flax",
                  decoder_impl="flax")
    base = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng, **kwargs
    )
    noop = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4, rng,
        guidance_fn=lambda x0: jnp.zeros_like(x0), **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(noop["grasp_tmrp"]), np.asarray(base["grasp_tmrp"])
    )


def test_success_guidance_increases_confidence():
    """Guidance ascends the decoder's log p(success): with the SAME rng the
    guided samples must score a higher mean success confidence."""
    cfg = FlagshipConfig(**TINY)
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(6)
    kwargs = dict(num_inference_steps=10, denoiser_impl="flax",
                  decoder_impl="flax")
    base = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 16, rng, **kwargs
    )
    guided = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 16, rng,
        guidance_scale=20.0, **kwargs
    )
    c0 = float(np.mean(base["confidence"]))
    c1 = float(np.mean(guided["confidence"]))
    assert np.all(np.isfinite(guided["grasp_tmrp"]))
    assert c1 > c0, (c0, c1)


def test_guidance_elucidated_samplers():
    cfg = FlagshipConfig(**TINY, elucidated=True, edm_num_sample_steps=6)
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(7)
    for sampler in ("dpmpp", "churn"):
        kwargs = dict(num_inference_steps=6, sampler=sampler,
                      denoiser_impl="flax", decoder_impl="flax")
        base = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 8, rng, **kwargs
        )
        guided = ldm_generate(
            vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 8, rng,
            guidance_scale=5.0, **kwargs
        )
        assert np.all(np.isfinite(guided["grasp_tmrp"]))
        assert (
            float(np.abs(guided["grasp_tmrp"] - base["grasp_tmrp"]).max())
            > 1e-6
        ), sampler


def test_cfg_plus_guidance_compose():
    cfg = FlagshipConfig(**TINY, conditioning="class")
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    out = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4,
        jax.random.PRNGKey(8), num_inference_steps=4,
        cls_cond=jnp.ones((4,)), cfg_scale=2.0, guidance_scale=1.0,
        denoiser_impl="flax", decoder_impl="flax",
    )
    assert out["grasps"].shape == (1, 4, 4, 4)
    assert np.all(np.isfinite(out["grasp_tmrp"]))


def test_sharded_generate_with_guidance():
    """Per-chip decoder-success guidance stays collective-free and matches
    the single-program guided result on the virtual mesh."""
    from graspldm_tpu.inference.sharded import make_sharded_ldm_generate
    from graspldm_tpu.parallel import make_mesh

    cfg = FlagshipConfig(**TINY)
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg, B=4)
    mesh = make_mesh(devices=jax.devices()[:4])
    key = jax.random.PRNGKey(11)
    run = make_sharded_ldm_generate(
        mesh, vae, ddm, diffusion, num_grasps=4, num_inference_steps=4,
        denoiser_impl="flax", guidance_scale=5.0,
    )
    out = run(vae_vars, ddm_vars, pc, key)
    assert out["grasps"].shape == (4, 4, 4, 4)
    # equals ldm_generate on each shard with the folded per-chip key
    ref = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion, pc[:1], 4,
        jax.random.fold_in(key, 0), num_inference_steps=4,
        denoiser_impl="flax", decoder_impl="flax", guidance_scale=5.0,
    )
    np.testing.assert_allclose(
        np.asarray(out["grasp_tmrp"][0]), np.asarray(ref["grasp_tmrp"][0]),
        atol=1e-5, rtol=1e-5,
    )


def test_ddm_train_step_cond_dropout():
    """cond_dropout trains (finite loss, params move) and actually drops:
    with cond_dropout=1.0 the step's loss is independent of the class
    values; with 0.0 it is not."""
    cfg = FlagshipConfig(**TINY, conditioning="class")
    vae, vae_vars, ddm, ddm_vars, diffusion, pc = _init_models(cfg)
    rng = jax.random.PRNGKey(9)
    tx = build_optimizer(1e-3)
    B, G = 2, 4
    grasps = jax.random.normal(rng, (B, G, 7))
    x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
    t = jnp.zeros((B * G,), jnp.int32)
    zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
    args = (x, t, zc) + _conditioning_example(cfg, B * G)
    state = init_train_state(ddm, tx, rng, args)

    def loss_with(dropout, cls_value):
        step = jax.jit(
            make_ddm_train_step(vae, ddm, diffusion, tx, cond_dropout=dropout)
        )
        batch = {
            "pc": pc,
            "grasps": grasps,
            "cls_cond": jnp.full((B, G), cls_value),
        }
        new_state, metrics = step(state, batch, rng, vae_vars)
        return float(metrics["loss"]), new_state

    l_full_a, st = loss_with(1.0, 0.0)
    l_full_b, _ = loss_with(1.0, 7.0)
    assert np.isfinite(l_full_a)
    assert l_full_a == l_full_b  # conditioning fully dropped
    l_keep_a, _ = loss_with(0.0, 0.0)
    l_keep_b, _ = loss_with(0.0, 7.0)
    assert l_keep_a != l_keep_b  # conditioning active
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), st.params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0.0
