"""Fused (slice-formulation) denoiser vs the flax module — exact parity."""

import numpy as np
import jax
import jax.numpy as jnp

from graspldm_tpu.models import GraspLatentDDM
from graspldm_tpu.models.fused_denoiser import (
    DenoiserDims,
    fused_denoiser_reference,
    pack_denoiser_weights,
)

DIMS = DenoiserDims(
    seq_len=4,
    block_channels=(32, 64, 128, 256),
    groups=4,
    emb_dim=16,
    cond_channels=3,
    cond_dim=64,
    fourier_dim=16,
)


def test_fused_reference_matches_flax_module():
    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(0)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.asarray([0, 1, 10, 100, 500, 999, 42, 7], jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(1), (BG, 3, 64))

    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    w = pack_denoiser_weights(variables, DIMS)
    got = np.asarray(fused_denoiser_reference(w, x, t, zc, DIMS))
    # fp32 reduction-order differences (slice formulation vs conv lowering)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)


def test_stacked_denoiser_parity():
    """Stacked-matmul formulation (banded conv matrices) equals the flax
    module — the production fast path for unconditional flagship sampling."""
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        pack_stacked_weights,
        stacked_denoiser_apply,
    )

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(4)
    BG = 12
    x = jax.random.normal(key, (BG, 1, 4))
    t = (jnp.arange(BG, dtype=jnp.int32) * 83) % 1000
    zc = jax.random.normal(jax.random.PRNGKey(5), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    w = pack_stacked_weights(variables, FLAGSHIP_DIMS)
    got = np.asarray(stacked_denoiser_apply(w, x, t, zc, FLAGSHIP_DIMS))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)

    # bf16 compute path stays close to fp32 (it is the bench configuration)
    got_bf16 = np.asarray(
        stacked_denoiser_apply(w, x, t, zc, FLAGSHIP_DIMS,
                               compute_dtype=jnp.bfloat16)
    )
    np.testing.assert_allclose(got_bf16, want, atol=0.15, rtol=0.1)


def test_stacked_pallas_interpret_parity():
    """The per-stage Pallas kernels (interpret mode, runs anywhere) match the
    flax module exactly in fp32 — the production TPU fast path."""
    from graspldm_tpu.models.stacked_pallas import (
        FLAGSHIP_DIMS,
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(6)
    BG = 16
    x = jax.random.normal(key, (BG, 1, 4))
    t = (jnp.arange(BG, dtype=jnp.int32) * 37) % 1000
    zc = jax.random.normal(jax.random.PRNGKey(7), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    got = np.asarray(
        stacked_denoiser_pallas_apply(
            w, x, t, zc, FLAGSHIP_DIMS, block_rows=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=5e-4)


def test_stacked_pallas_z16_ppc_parity():
    """Generic-L Pallas kernels (sliced convs + per-position projections,
    interpret mode) match the flax module at the partial-pc z16 dims."""
    from graspldm_tpu.models.fused_denoiser import DenoiserDims
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(
        dropout=None, latent_in_features=16, pc_latent_size=256
    )
    dims = DenoiserDims(
        seq_len=16, block_channels=(32, 64, 128, 256), groups=4,
        emb_dim=64, cond_channels=3, cond_dim=256, fourier_dim=16,
    )
    key = jax.random.PRNGKey(16)
    BG = 16
    x = jax.random.normal(key, (BG, 1, 16))
    t = (jnp.arange(BG, dtype=jnp.int32) * 91) % 1000
    zc = jax.random.normal(jax.random.PRNGKey(17), (BG, 3, 256))
    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    w = pack_pallas_weights(variables, dims, dtype=jnp.float32)
    got = np.asarray(
        stacked_denoiser_pallas_apply(
            w, x, t, zc, dims, block_rows=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=5e-4)


def test_stacked_pallas_attn_impl_parity():
    """Every attention score-path strategy (mloop/lloop/pairs/opt) is exact:
    parity vs the flax module at the z16 dims where attention dominates."""
    from graspldm_tpu.models.fused_denoiser import DenoiserDims
    from graspldm_tpu.models import stacked_pallas as sp

    ddm = GraspLatentDDM(
        dropout=None, latent_in_features=16, pc_latent_size=256,
        block_channels=(32, 64),
    )
    dims = DenoiserDims(
        seq_len=16, block_channels=(32, 64), groups=4,
        emb_dim=64, cond_channels=3, cond_dim=256, fourier_dim=16,
    )
    key = jax.random.PRNGKey(26)
    BG = 16
    x = jax.random.normal(key, (BG, 1, 16))
    t = (jnp.arange(BG, dtype=jnp.int32) * 53) % 1000
    zc = jax.random.normal(jax.random.PRNGKey(27), (BG, 3, 256))
    variables = ddm.init({"params": key}, x, t, zc)
    want = np.asarray(ddm.apply(variables, x, t, zc))

    prev = sp.ATTN_IMPL
    try:
        for impl in ("lloop", "pairs", "opt"):
            sp.ATTN_IMPL = impl
            w = sp.pack_pallas_weights(variables, dims, dtype=jnp.float32)
            got = np.asarray(
                sp.stacked_denoiser_pallas_apply(
                    w, x, t, zc, dims, block_rows=8, interpret=True
                )
            )
            np.testing.assert_allclose(
                got, want, atol=2e-4, rtol=5e-4,
                err_msg=f"ATTN_IMPL={impl}",
            )
    finally:
        sp.ATTN_IMPL = prev


def test_conditioned_models_on_kernel_paths():
    """Class/region conditioning is a step-invariant additive embedding:
    the stacked and Pallas paths reproduce the flax conditioned denoisers
    exactly by folding `compute_extra_emb` into the input embedding."""
    from graspldm_tpu.models.conditioning import (
        ClassConditionedGraspLatentDDM,
        RegionConditionedGraspLatentDDM,
    )
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_extra_emb,
        compute_input_emb,
        pack_stacked_weights,
        stacked_denoiser_apply,
    )
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    key = jax.random.PRNGKey(21)
    BG = 16
    x = jax.random.normal(key, (BG, 1, 4))
    t = (jnp.arange(BG, dtype=jnp.int32) * 53) % 1000
    zc = jax.random.normal(jax.random.PRNGKey(22), (BG, 3, 64))

    # class-conditioned
    ddm = ClassConditionedGraspLatentDDM(dropout=None)
    cls = jnp.linspace(0.0, 1.0, BG)
    variables = ddm.init({"params": key}, x, t, zc, cls_cond=cls)
    want = np.asarray(ddm.apply(variables, x, t, zc, cls_cond=cls))

    w = pack_stacked_weights(variables, FLAGSHIP_DIMS)
    extra = compute_extra_emb(w, cls_cond=cls)
    got = np.asarray(
        stacked_denoiser_apply(w, x, t, zc, FLAGSHIP_DIMS, extra_emb=extra)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=5e-4)

    wp = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(wp, zc) + compute_extra_emb(wp, cls_cond=cls)[
        :, None, :
    ]
    got_p = np.asarray(
        stacked_denoiser_pallas_apply(
            wp, x, t, zc, FLAGSHIP_DIMS, block_rows=8, interpret=True,
            input_emb=ie,
        )
    )
    np.testing.assert_allclose(got_p, want, atol=2e-4, rtol=5e-4)

    # region-conditioned
    ddm_r = RegionConditionedGraspLatentDDM(dropout=None)
    rp = jax.random.normal(jax.random.PRNGKey(23), (BG, 32, 3))
    variables_r = ddm_r.init({"params": key}, x, t, zc, region_points=rp)
    want_r = np.asarray(ddm_r.apply(variables_r, x, t, zc, region_points=rp))
    w_r = pack_stacked_weights(variables_r, FLAGSHIP_DIMS)
    extra_r = compute_extra_emb(w_r, region_points=rp)
    got_r = np.asarray(
        stacked_denoiser_apply(
            w_r, x, t, zc, FLAGSHIP_DIMS, extra_emb=extra_r
        )
    )
    np.testing.assert_allclose(got_r, want_r, atol=1e-4, rtol=5e-4)


def test_elucidated_sampler_on_stacked_path():
    """The EDM/DPM++ samplers call the denoiser with continuous c_noise
    "timesteps"; the stacked kernel path's time embedding must reproduce
    the flax module there too (the auto impl picks the kernels for
    elucidated flagship checkpoints on TPU)."""
    from graspldm_tpu.diffusion import ElucidatedDiffusion
    from graspldm_tpu.inference.pipeline import _make_denoise_fn

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(31)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(32), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)

    diff = ElucidatedDiffusion(n_dims=4, num_sample_steps=4)
    d_flax = _make_denoise_fn(ddm, variables, {}, jnp.float32, "flax")
    d_stacked = _make_denoise_fn(ddm, variables, {}, jnp.float32, "stacked")

    for sampler_kw in ({"use_dpmpp": True}, {"use_dpmpp": False}):
        x0_f, _ = diff.sample(
            d_flax, jax.random.PRNGKey(5), batch_size=BG, z_cond=zc,
            num_sample_steps=4, **sampler_kw,
        )
        x0_s, _ = diff.sample(
            d_stacked, jax.random.PRNGKey(5), batch_size=BG, z_cond=zc,
            num_sample_steps=4, **sampler_kw,
        )
        np.testing.assert_allclose(
            np.asarray(x0_s), np.asarray(x0_f), atol=5e-4, rtol=5e-4
        )


def test_fused_sampler_parity():
    """The kernels-only sampler (time embedding, init matmul and the
    DDIM/DDPM update folded into the stage kernels; zero XLA ops in the
    scan body) reproduces `GaussianDiffusion1D.sample` over the pallas
    denoiser — same PRNG consumption, same trajectory."""
    from graspldm_tpu.diffusion import GaussianDiffusion1D
    from graspldm_tpu.diffusion.schedules import DiffusionSchedule
    from graspldm_tpu.models.pallas_sampler import fused_sample
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(41)
    BG = 16
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(42), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)

    schedule = DiffusionSchedule.create(
        num_steps=40, beta_start=5e-5, beta_end=1e-3
    )
    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    for sampler in ("ddim", "ddpm"):
        diff = GaussianDiffusion1D(schedule=schedule, n_dims=4)

        def denoise(x, t, z):
            return stacked_denoiser_pallas_apply(
                w, x, t, z, FLAGSHIP_DIMS, block_rows=8, interpret=True,
                input_emb=ie,
            )

        want, want_traj = diff.sample(
            denoise, jax.random.PRNGKey(9), batch_size=BG, z_cond=zc,
            num_inference_steps=5, sampler=sampler, return_trajectory=True,
        )
        got, got_traj = fused_sample(
            w, FLAGSHIP_DIMS, schedule, ie, jax.random.PRNGKey(9),
            batch_size=BG, num_inference_steps=5, sampler=sampler,
            return_trajectory=True, block_rows=8, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
        )
        assert got_traj.shape == want_traj.shape == (6, BG, 1, 4)
        np.testing.assert_allclose(
            np.asarray(got_traj), np.asarray(want_traj), atol=5e-4,
            rtol=5e-4,
        )

    # padded-rows case: BG not a multiple of block_rows (per-step AND
    # whole-scan lowerings — pad rows run as garbage end-to-end in both)
    got_pad, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie[:10], jax.random.PRNGKey(9),
        batch_size=10, num_inference_steps=5, sampler="ddim",
        block_rows=8, interpret=True, fuse_scan=False,
    )
    got_pad_mega, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie[:10], jax.random.PRNGKey(9),
        batch_size=10, num_inference_steps=5, sampler="ddim",
        block_rows=8, interpret=True, fuse_scan=True,
    )
    def denoise10(x, t, z):
        return stacked_denoiser_pallas_apply(
            w, x, t, z, FLAGSHIP_DIMS, block_rows=2, interpret=True,
            input_emb=ie[:10],
        )
    diff = GaussianDiffusion1D(schedule=schedule, n_dims=4)
    want_pad, _ = diff.sample(
        denoise10, jax.random.PRNGKey(9), batch_size=10, z_cond=zc[:10],
        num_inference_steps=5, sampler="ddim",
    )
    np.testing.assert_allclose(
        np.asarray(got_pad), np.asarray(want_pad), atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pad_mega), np.asarray(want_pad), atol=5e-4, rtol=5e-4
    )


def test_fused_sampler_fuse_stages_parity():
    """fuse_stages=True (ONE launch per step) equals the per-stage fused
    sampler exactly — same kernels, same math, different launch grouping."""
    from graspldm_tpu.diffusion.schedules import DiffusionSchedule
    from graspldm_tpu.models.pallas_sampler import fused_sample
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models.stacked_pallas import pack_pallas_weights

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(61)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(62), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    schedule = DiffusionSchedule.create(num_steps=30)
    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    for sampler in ("ddim", "ddpm"):
        a, _ = fused_sample(
            w, FLAGSHIP_DIMS, schedule, ie, jax.random.PRNGKey(2),
            batch_size=BG, num_inference_steps=3, sampler=sampler,
            block_rows=8, interpret=True, fuse_scan=False,
        )
        b, _ = fused_sample(
            w, FLAGSHIP_DIMS, schedule, ie, jax.random.PRNGKey(2),
            batch_size=BG, num_inference_steps=3, sampler=sampler,
            block_rows=8, interpret=True, fuse_stages=True, fuse_scan=False,
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
        )


def test_fused_sampler_z16_parity():
    """Fused sampler at the partial-pc z16 dims (generic-L kernels)."""
    from graspldm_tpu.diffusion import GaussianDiffusion1D
    from graspldm_tpu.diffusion.schedules import DiffusionSchedule
    from graspldm_tpu.models.pallas_sampler import fused_sample
    from graspldm_tpu.models.stacked_denoiser import compute_input_emb
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(
        dropout=None, latent_in_features=16, pc_latent_size=256
    )
    dims = DenoiserDims(
        seq_len=16, block_channels=(32, 64, 128, 256), groups=4,
        emb_dim=64, cond_channels=3, cond_dim=256, fourier_dim=16,
    )
    key = jax.random.PRNGKey(51)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 16))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(52), (BG, 3, 256))
    variables = ddm.init({"params": key}, x, t, zc)

    schedule = DiffusionSchedule.create(num_steps=30)
    w = pack_pallas_weights(variables, dims, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    def denoise(x, t, z):
        return stacked_denoiser_pallas_apply(
            w, x, t, z, dims, block_rows=8, interpret=True, input_emb=ie
        )

    diff = GaussianDiffusion1D(schedule=schedule, n_dims=16)
    want, _ = diff.sample(
        denoise, jax.random.PRNGKey(3), batch_size=BG, z_cond=zc,
        num_inference_steps=3, sampler="ddim",
    )
    got, _ = fused_sample(
        w, dims, schedule, ie, jax.random.PRNGKey(3), batch_size=BG,
        num_inference_steps=3, sampler="ddim", block_rows=8, interpret=True,
        fuse_scan=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
    )
    # the whole-scan megakernel at z16 (sliced convs / grouped qkv forms)
    got_mega, _ = fused_sample(
        w, dims, schedule, ie, jax.random.PRNGKey(3), batch_size=BG,
        num_inference_steps=3, sampler="ddim", block_rows=8, interpret=True,
        fuse_scan=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_mega), np.asarray(want), atol=5e-4, rtol=5e-4
    )


def test_fused_dpmpp_sampler_parity():
    """The kernels-only DPM-Solver++(2M) sampler (EDM preconditioning and
    the 2M update folded into the kernels) reproduces
    `ElucidatedDiffusion.sample_dpmpp`, per-stage and single-launch."""
    from graspldm_tpu.diffusion import ElucidatedDiffusion
    from graspldm_tpu.models.pallas_sampler import fused_sample_dpmpp
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(71)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(72), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    ed = ElucidatedDiffusion(n_dims=4, num_sample_steps=4)

    def denoise(x, t, z):
        return stacked_denoiser_pallas_apply(
            w, x, t, z, FLAGSHIP_DIMS, block_rows=8, interpret=True,
            input_emb=ie,
        )

    want, want_traj = ed.sample_dpmpp(
        denoise, jax.random.PRNGKey(11), batch_size=BG, z_cond=zc,
        num_sample_steps=4, return_trajectory=True,
    )
    for fuse in (False, True):
        got, got_traj = fused_sample_dpmpp(
            w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(11),
            batch_size=BG, num_sample_steps=4, block_rows=8,
            interpret=True, return_trajectory=True, fuse_stages=fuse,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
        )
        assert got_traj.shape == want_traj.shape
        np.testing.assert_allclose(
            np.asarray(got_traj), np.asarray(want_traj), atol=5e-4,
            rtol=5e-4,
        )


def test_fused_churn_sampler_parity():
    """The kernels-only EDM churn sampler (stochastic Heun; two net
    evaluations per step) reproduces `ElucidatedDiffusion.sample_churn`,
    per-stage and single-launch — same PRNG consumption."""
    from graspldm_tpu.diffusion import ElucidatedDiffusion
    from graspldm_tpu.models.pallas_sampler import fused_sample_churn
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models.stacked_pallas import (
        pack_pallas_weights,
        stacked_denoiser_pallas_apply,
    )

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(81)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(82), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    ed = ElucidatedDiffusion(n_dims=4, num_sample_steps=4)

    def denoise(x, t, z):
        return stacked_denoiser_pallas_apply(
            w, x, t, z, FLAGSHIP_DIMS, block_rows=8, interpret=True,
            input_emb=ie,
        )

    want, want_traj = ed.sample_churn(
        denoise, jax.random.PRNGKey(13), batch_size=BG, z_cond=zc,
        num_sample_steps=4, return_trajectory=True,
    )
    for fuse in (False, True):
        got, got_traj = fused_sample_churn(
            w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(13),
            batch_size=BG, num_sample_steps=4, block_rows=8,
            interpret=True, return_trajectory=True, fuse_stages=fuse,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4
        )
        assert got_traj.shape == want_traj.shape
        np.testing.assert_allclose(
            np.asarray(got_traj), np.asarray(want_traj), atol=5e-4,
            rtol=5e-4,
        )


def test_mega_sampler_parity():
    """fuse_scan=True (the whole-scan megakernel: ONE launch per row
    chunk, fori_loop over ALL steps inside the kernel with weights and
    conditioning VMEM-resident) equals the per-step fused samplers for
    every family — same kernel math, same PRNG consumption (per-step
    noise precomputed outside the kernel in the same split order)."""
    from graspldm_tpu.diffusion import ElucidatedDiffusion
    from graspldm_tpu.diffusion.schedules import DiffusionSchedule
    from graspldm_tpu.models.pallas_sampler import (
        fused_sample,
        fused_sample_churn,
        fused_sample_dpmpp,
    )
    from graspldm_tpu.models.stacked_denoiser import (
        FLAGSHIP_DIMS,
        compute_input_emb,
    )
    from graspldm_tpu.models.stacked_pallas import pack_pallas_weights

    ddm = GraspLatentDDM(dropout=None)
    key = jax.random.PRNGKey(91)
    BG = 8
    x = jax.random.normal(key, (BG, 1, 4))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(jax.random.PRNGKey(92), (BG, 3, 64))
    variables = ddm.init({"params": key}, x, t, zc)
    schedule = DiffusionSchedule.create(num_steps=30)
    w = pack_pallas_weights(variables, FLAGSHIP_DIMS, dtype=jnp.float32)
    ie = compute_input_emb(w, zc)

    for sampler in ("ddim", "ddpm"):
        a, _ = fused_sample(
            w, FLAGSHIP_DIMS, schedule, ie, jax.random.PRNGKey(3),
            batch_size=BG, num_inference_steps=3, sampler=sampler,
            block_rows=8, interpret=True, fuse_scan=False,
        )
        b, traj = fused_sample(
            w, FLAGSHIP_DIMS, schedule, ie, jax.random.PRNGKey(3),
            batch_size=BG, num_inference_steps=3, sampler=sampler,
            block_rows=8, interpret=True, fuse_scan=True,
        )
        assert traj is None
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
        )

    # padded rows: BG not a multiple of block_rows; pad rows run as
    # garbage through all steps and are sliced away
    a, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie[:6], jax.random.PRNGKey(4),
        batch_size=6, num_inference_steps=3, sampler="ddim",
        block_rows=4, interpret=True, fuse_scan=False,
    )
    b, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie[:6], jax.random.PRNGKey(4),
        batch_size=6, num_inference_steps=3, sampler="ddim",
        block_rows=4, interpret=True, fuse_scan=True,
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
    )

    # the single-chunk bump (_mega_rows: 128 <= BGp <= 1024 raises the
    # row chunk to the whole padded batch), incl. a padded tail
    zc_big = jax.random.normal(jax.random.PRNGKey(93), (130, 3, 64))
    ie_big = compute_input_emb(w, zc_big)
    a, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie_big, jax.random.PRNGKey(7),
        batch_size=130, num_inference_steps=3, sampler="ddim",
        block_rows=64, interpret=True, fuse_scan=False,
    )
    b, _ = fused_sample(
        w, FLAGSHIP_DIMS, schedule, ie_big, jax.random.PRNGKey(7),
        batch_size=130, num_inference_steps=3, sampler="ddim",
        block_rows=64, interpret=True, fuse_scan=True,
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
    )

    ed = ElucidatedDiffusion(n_dims=4, num_sample_steps=4)
    a, _ = fused_sample_dpmpp(
        w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(5), batch_size=BG,
        num_sample_steps=4, block_rows=8, interpret=True, fuse_scan=False,
    )
    b, _ = fused_sample_dpmpp(
        w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(5), batch_size=BG,
        num_sample_steps=4, block_rows=8, interpret=True, fuse_scan=True,
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5
    )

    a, _ = fused_sample_churn(
        w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(6), batch_size=BG,
        num_sample_steps=4, block_rows=8, interpret=True, fuse_scan=False,
    )
    b, _ = fused_sample_churn(
        w, FLAGSHIP_DIMS, ed, ie, jax.random.PRNGKey(6), batch_size=BG,
        num_sample_steps=4, block_rows=8, interpret=True, fuse_scan=True,
    )
    # both paths share _churn_step_v; the residual is fusion-ordering
    # noise amplified by the two-eval Heun dynamics (same 5e-4 budget as
    # the reference-parity sampler tests above)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4
    )


def test_decoder_fast_path_parity():
    """The VAE decoder (plain conditional ResNet1D + heads) through the
    generic-L Pallas kernels matches GraspCVAE.decode exactly."""
    from graspldm_tpu.flagship import FlagshipConfig, build_flagship
    from graspldm_tpu.models.fast_decoder import (
        decoder_dims_for,
        decoder_fast_apply,
        pack_decoder_weights,
    )

    cfg = FlagshipConfig(
        pc_num_points=32, pc_scale_voxel_resolution=0.25,
        pc_scale_channels=0.25, dropout=None,
    )
    vae, _, _ = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    BG = 16
    pc = jax.random.normal(rng, (2, 32, 3))
    grasps = jax.random.normal(rng, (4, 7))
    v = vae.init({"params": rng, "dropout": rng}, pc, grasps)
    z_h = jax.random.normal(jax.random.PRNGKey(1), (BG, cfg.grasp_latent_size))
    z_pc = jax.random.normal(
        jax.random.PRNGKey(2), (BG, cfg.pc_latent_channels, cfg.pc_latent_size)
    )
    want = vae.apply(v, z_h, z_pc, method="decode")
    dims = decoder_dims_for(vae)
    w = pack_decoder_weights(v, dims, dtype=jnp.float32)
    got = decoder_fast_apply(w, z_h, z_pc, dims, block_rows=8, interpret=True)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=5e-4
        )
