"""Mixed-precision (bf16) training: ``FlagshipConfig.train_dtype``.

The VAE encode stack (PVCNN pc encoder + grasp-encoder core) computes in
bfloat16 while params, optimizer state, the mu/logvar bottleneck, output
heads and losses stay fp32 — the standard TPU mixed-precision recipe
(params fp32, activations bf16, reductions fp32). The reference trains
fp32-only (`grasp_ldm/trainers/trainer.py` has no precision knob); this is
a TPU-native addition.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graspldm_tpu.flagship import FlagshipConfig, build_flagship
from graspldm_tpu.training import (
    init_train_state,
    make_ddm_train_step,
    make_vae_train_step,
)
from graspldm_tpu.training.optim import build_optimizer

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
)


def _batch(B=2, G=4, N=64, seed=0):
    rng = jax.random.PRNGKey(seed)
    pc = jax.random.normal(rng, (B, N, 3))
    grasps = jax.random.normal(rng, (B, G, 7)) * 0.1
    return {"pc": pc, "grasps": grasps}


def _run_steps(cfg, n_steps=3, seed=0):
    """Init + n VAE train steps; returns (losses, state, vae)."""
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(seed)
    tx = build_optimizer(1e-3)
    batch = _batch()
    state = init_train_state(
        vae, tx, rng, (batch["pc"], batch["grasps"].reshape(-1, 7)), {"rng": rng}
    )
    step = jax.jit(make_vae_train_step(vae, tx))
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    return losses, state, vae


def test_bf16_encoder_dtypes():
    """bf16 encode path: z_pc comes out bf16; params, mu/logvar and the
    decoder outputs stay fp32 (flax dtype=None promotion restores full
    precision at the bottleneck and heads)."""
    cfg = FlagshipConfig(**TINY, train_dtype="bfloat16")
    vae, _, _ = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _batch()
    variables = jax.jit(
        lambda: vae.init(
            {"params": rng, "dropout": rng},
            batch["pc"],
            batch["grasps"].reshape(-1, 7),
            rng=rng,
        )
    )()
    # params stay fp32 regardless of compute dtype
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(variables["params"])
    )
    z_pc = vae.apply(variables, batch["pc"], method="encode_pc")
    assert z_pc.dtype == jnp.bfloat16
    z_rep = jnp.repeat(z_pc, 4, axis=0)
    mu, logvar = vae.apply(
        variables, batch["grasps"].reshape(-1, 7), z_rep, method="encode_grasp"
    )
    assert mu.dtype == jnp.float32 and logvar.dtype == jnp.float32
    out = vae.apply(variables, mu, z_rep, method="decode")
    assert out[0].dtype == jnp.float32


def test_bf16_vae_step_trains_close_to_fp32():
    """Same seeds: the bf16 trajectory tracks fp32 (same fp32 param init).

    At random init the deep bf16 encode stack amplifies rounding into
    ~10% loss offsets (measured 27.4 vs 31.0 at step 1), so the contract
    is: finite, strictly decreasing, and same order as fp32 — not
    bitwise closeness.
    """
    fp32_losses, fp32_state, _ = _run_steps(FlagshipConfig(**TINY))
    bf16_losses, bf16_state, _ = _run_steps(
        FlagshipConfig(**TINY, train_dtype="bfloat16")
    )
    assert all(np.isfinite(bf16_losses))
    assert all(b > a for a, b in zip(bf16_losses[1:], bf16_losses[:-1]))
    for lf, lb in zip(fp32_losses, bf16_losses):
        assert abs(lf - lb) / max(abs(lf), 1e-6) < 0.30, (fp32_losses, bf16_losses)
    # params moved and stayed fp32
    assert int(bf16_state.step) == 3
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(bf16_state.params)
    )


def test_bf16_ddm_step():
    """Stage 2 under train_dtype: frozen-VAE encode runs bf16, the
    denoiser loss is finite and fp32, params update."""
    cfg = FlagshipConfig(**TINY, train_dtype="bfloat16")
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(1e-3)
    batch = _batch()
    vae_state = init_train_state(
        vae, tx, rng, (batch["pc"], batch["grasps"].reshape(-1, 7)), {"rng": rng}
    )
    frozen = {"params": vae_state.params}
    if vae_state.batch_stats is not None:
        frozen["batch_stats"] = vae_state.batch_stats
    B, G = batch["pc"].shape[0], batch["grasps"].shape[1]
    x = jnp.zeros((B * G, 1, cfg.grasp_latent_size))
    t = jnp.zeros((B * G,), jnp.int32)
    zc = jnp.zeros((B * G, cfg.pc_latent_channels, cfg.pc_latent_size))
    ddm_state = init_train_state(ddm, tx, rng, (x, t, zc))
    step = jax.jit(make_ddm_train_step(vae, ddm, diffusion, tx))
    before = jax.tree.leaves(ddm_state.params)[0]
    ddm_state, metrics = step(ddm_state, batch, rng, frozen)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert metrics["loss"].dtype == jnp.float32
    after = jax.tree.leaves(ddm_state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_train_dtype_string_resolution():
    """String dtypes resolve; "float32"/"fp32"/None mean full precision."""
    from graspldm_tpu.flagship import _resolve_dtype

    assert _resolve_dtype(None) is None
    assert _resolve_dtype("float32") is None
    assert _resolve_dtype("fp32") is None
    assert _resolve_dtype("bfloat16") is jnp.bfloat16
    assert _resolve_dtype(jnp.bfloat16) is jnp.bfloat16


def test_avg_voxelize_counts_exact_in_bf16():
    """Dense voxels with > 256 points average correctly for bf16 features
    (counts accumulate fp32; a bf16 running count saturates at 256)."""
    from graspldm_tpu.ops import avg_voxelize

    N = 600  # all points land in one voxel -> count 600 > bf16's 256
    feats = jnp.ones((1, N, 4), jnp.bfloat16) * 2.0
    coords = jnp.zeros((1, N, 3), jnp.float32)
    for method in ("matmul", "scatter"):
        out = avg_voxelize(feats, coords, resolution=2, method=method)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out[0, 0], np.float32), 2.0, rtol=1e-2
        )
