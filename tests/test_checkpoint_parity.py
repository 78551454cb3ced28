"""Published-checkpoint-format parity: full GraspCVAE + GraspLatentDDM.

Builds the REAL reference torch modules (via :mod:`reference_oracle`, with
the CUDA functional layer replaced by pure-torch semantics), assembles
checkpoints in the published dual-prefix layout (``model.`` /
``ema_model.online_model.``, `utils/torch_utils.py:4-37` +
`tools/inference.py:514-566`), converts them with
`graspldm_tpu/utils/torch_convert.py`, and asserts forward parity of:

  * z_pc (PVCNN encoder, the full voxel+point branch stack)
  * grasp encoder -> bottleneck mu/logvar
  * decoder outputs (tmrp / class logits / qualities)
  * denoiser eps through the GraspLatentDDM checkpoint key space
  * a chained multi-step DDIM trajectory under fixed noise

This is the strongest offline equivalent of loading the HF checkpoints: the
key space, module nesting and forward math are the reference's own code.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from reference_oracle import AttrDict, load_reference  # noqa: E402

from graspldm_tpu.models.grasp_vae import GraspCVAE  # noqa: E402
from graspldm_tpu.utils.torch_convert import (  # noqa: E402
    fix_state_dict_prefix,
    grasp_cvae_variables_from_torch,
    grasp_ldm_variables_from_torch,
)

# tiny flagship-shaped config (same structure as fpc_1a, scaled down)
N_POINTS = 64
PC_LATENT = 16
PC_CHANNELS = 3
GRASP_LATENT = 4
BLOCKS = (8, 16)
GROUPS = 4


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _build_ref_vae(ref, num_qualities=None):
    from grasp_ldm.models.grasp_vae import GraspCVAE as RefGraspCVAE

    pc_encoder_config = AttrDict(
        type="PVCNNEncoder",
        args=dict(
            in_features=3,
            n_points=N_POINTS,
            scale_channels=0.25,
            scale_voxel_resolution=0.25,
            num_blocks=(1, 1, 1, 1),
            out_channels=PC_CHANNELS,
            use_global_attention=False,
        ),
    )
    core_args = dict(
        in_features=7,
        block_channels=BLOCKS,
        input_conditioning_dims=PC_LATENT,
        resnet_block_groups=GROUPS,
        dropout=None,
    )
    grasp_encoder_config = AttrDict(type="ResNet1D", args=dict(core_args))
    decoder_config = AttrDict(
        type="ResNet1D",
        args={k: v for k, v in core_args.items() if k != "in_features"},
    )
    loss_config = AttrDict(
        reconstruction_loss=dict(
            type="GraspReconstructionLoss",
            args=dict(translation_weight=1, rotation_weight=1),
        ),
        latent_loss=dict(type="VAELatentLoss", args=dict(weight=1.0)),
    )
    torch.manual_seed(7)
    return RefGraspCVAE(
        grasp_latent_size=GRASP_LATENT,
        pc_latent_size=PC_LATENT,
        grasp_encoder_config=grasp_encoder_config,
        pc_encoder_config=pc_encoder_config,
        decoder_config=decoder_config,
        loss_config=loss_config,
        num_output_qualities=num_qualities,
    ).eval()


def _our_vae(num_qualities=None):
    return GraspCVAE(
        grasp_latent_size=GRASP_LATENT,
        pc_latent_size=PC_LATENT,
        pc_latent_channels=PC_CHANNELS,
        grasp_representation_dims=7,
        block_channels=BLOCKS,
        resnet_block_groups=GROUPS,
        dropout=None,
        num_output_qualities=num_qualities,
        pc_num_points=N_POINTS,
        pc_scale_channels=0.25,
        pc_scale_voxel_resolution=0.25,
    )


def _dual_prefix_checkpoint(tmodel):
    """PL-style checkpoint: raw weights under ``model.``, EMA (here: the real
    weights; the raw family is perturbed) under ``ema_model.online_model.``"""
    sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    ckpt = {}
    for k, v in sd.items():
        ckpt[f"ema_model.online_model.{k}"] = v
        ckpt[f"model.{k}"] = v * 1.5 if v.dtype.is_floating_point else v
    return ckpt


class TestGraspCVAEParity:
    def test_full_vae_parity_via_published_layout(self, ref):
        tmodel = _build_ref_vae(ref)
        ckpt = _dual_prefix_checkpoint(tmodel)

        # EMA family selection (the reference inference default,
        # `tools/inference.py:520-524`)
        sd = fix_state_dict_prefix(ckpt, "ema_model.online_model")
        variables = grasp_cvae_variables_from_torch(sd, num_core_blocks=len(BLOCKS))
        jmodel = _our_vae()

        torch.manual_seed(0)
        B, G = 2, 3
        pc_t = torch.randn(B, N_POINTS, 3)
        grasp_t = torch.randn(B * G, 7)

        with torch.no_grad():
            z_pc_t = tmodel.encoder.pc_encoder(pc_t)
        z_pc_j = jmodel.apply(variables, jnp.asarray(pc_t.numpy()),
                              method="encode_pc")
        np.testing.assert_allclose(
            np.asarray(z_pc_j), z_pc_t.numpy(), atol=2e-4, rtol=1e-4
        )

        # grasp encoder -> bottleneck
        z_pc_rep_t = z_pc_t.repeat_interleave(G, dim=0)
        with torch.no_grad():
            z_g_t = tmodel.encoder.grasp_encoder(
                grasp_t.unsqueeze(1), cond=z_pc_rep_t
            )
            mu_t, logvar_t = tmodel.bottleneck(z_g_t.squeeze(-2))
        mu_j, logvar_j = jmodel.apply(
            variables,
            jnp.asarray(grasp_t.numpy()),
            jnp.asarray(z_pc_rep_t.numpy()),
            method="encode_grasp",
        )
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                                   atol=2e-4, rtol=1e-4)

        # decoder heads under a shared latent
        torch.manual_seed(1)
        z_h_t = torch.randn(B * G, GRASP_LATENT)
        with torch.no_grad():
            tmrp_t, cls_t = tmodel.decoder(z_h_t, cond=z_pc_rep_t)
        out_j = jmodel.apply(
            variables,
            jnp.asarray(z_h_t.numpy()),
            jnp.asarray(z_pc_rep_t.numpy()),
            method="decode",
        )
        np.testing.assert_allclose(np.asarray(out_j[0]), tmrp_t.numpy(),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out_j[1]), cls_t.numpy(),
                                   atol=2e-4, rtol=1e-4)

        # the raw-weight family is genuinely different -> prefix selection
        # is load-bearing
        sd_raw = fix_state_dict_prefix(ckpt, "model")
        variables_raw = grasp_cvae_variables_from_torch(
            sd_raw, num_core_blocks=len(BLOCKS)
        )
        z_raw = jmodel.apply(variables_raw, jnp.asarray(pc_t.numpy()),
                             method="encode_pc")
        assert float(jnp.abs(z_raw - z_pc_j).max()) > 1e-3

    def test_vae_with_qualities_parity(self, ref):
        tmodel = _build_ref_vae(ref, num_qualities=4)
        sd = {k: v for k, v in tmodel.state_dict().items()}
        variables = grasp_cvae_variables_from_torch(sd, num_core_blocks=len(BLOCKS))
        jmodel = _our_vae(num_qualities=4)

        torch.manual_seed(2)
        B, G = 1, 2
        pc_t = torch.randn(B, N_POINTS, 3)
        z_h_t = torch.randn(B * G, GRASP_LATENT)
        with torch.no_grad():
            z_pc_t = tmodel.encoder.pc_encoder(pc_t)
            z_pc_rep = z_pc_t.repeat_interleave(G, dim=0)
            tmrp_t, cls_t, quals_t = tmodel.decoder(z_h_t, cond=z_pc_rep)
        out_j = jmodel.apply(
            variables,
            jnp.asarray(z_h_t.numpy()),
            jnp.asarray(z_pc_rep.numpy()),
            method="decode",
        )
        assert len(out_j) == 3
        np.testing.assert_allclose(np.asarray(out_j[2]), quals_t.numpy(),
                                   atol=2e-4, rtol=1e-4)


class TestGraspLatentDDMParity:
    @pytest.fixture(scope="class")
    def ddm_pair(self, ref):
        """Reference denoiser + fabricated DDM-checkpoint layout + our model."""
        from grasp_ldm.models.modules.resnets import (
            TimeConditionedResNet1D as RefDenoiser,
        )

        from graspldm_tpu.models.grasp_ldm import GraspLatentDDM

        torch.manual_seed(3)
        tnet = RefDenoiser(
            dim=GRASP_LATENT,
            block_channels=BLOCKS,
            channels=1,
            input_conditioning_dims=PC_LATENT,
            resnet_block_groups=GROUPS,
            dropout=None,
            is_time_conditioned=True,
            random_fourier_features=True,
            learned_sinusoidal_dim=16,
        ).eval()

        # the published single-checkpoint layout holds BOTH the denoiser
        # (diffusion_model.model.) and the frozen VAE (vae_model.)
        ckpt = {}
        for k, v in tnet.state_dict().items():
            ckpt[f"ema_model.online_model.diffusion_model.model.{k}"] = v
        tvae = _build_ref_vae(ref)
        for k, v in tvae.state_dict().items():
            ckpt[f"ema_model.online_model.vae_model.{k}"] = v

        sd = fix_state_dict_prefix(ckpt, "ema_model.online_model")
        variables = grasp_ldm_variables_from_torch(sd, num_blocks=len(BLOCKS))
        vae_variables = grasp_cvae_variables_from_torch(
            fix_state_dict_prefix(sd, "vae_model"), num_core_blocks=len(BLOCKS)
        )
        jddm = GraspLatentDDM(
            latent_in_features=GRASP_LATENT,
            pc_latent_size=PC_LATENT,
            block_channels=BLOCKS,
            resnet_block_groups=GROUPS,
            dropout=None,
        )
        return tnet, jddm, variables, vae_variables

    def test_denoiser_eps_parity(self, ddm_pair):
        tnet, jddm, variables, _ = ddm_pair
        torch.manual_seed(4)
        B = 5
        x_t = torch.randn(B, 1, GRASP_LATENT)
        z_t = torch.randn(B, PC_CHANNELS, PC_LATENT)
        t_t = torch.randint(0, 1000, (B,)).long()
        with torch.no_grad():
            want = tnet(x_t, time=t_t, z_cond=z_t).numpy()
        got = jddm.apply(
            variables,
            jnp.asarray(x_t.numpy()),
            jnp.asarray(t_t.numpy()),
            jnp.asarray(z_t.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    def test_ddim_trajectory_parity(self, ddm_pair):
        """Chained multi-step DDIM under fixed noise: our fused `lax.scan`
        sampler vs a torch host loop over the reference denoiser. Error
        accumulation through the full reverse chain must stay at fp32 noise
        (SURVEY.md §4 golden-trajectory strategy)."""
        from graspldm_tpu.diffusion import DiffusionSchedule, GaussianDiffusion1D

        tnet, jddm, variables, _ = ddm_pair
        schedule = DiffusionSchedule.create(
            num_steps=100, beta_schedule="linear",
            beta_start=5e-5, beta_end=1e-3,
        )
        diffusion = GaussianDiffusion1D(schedule=schedule, n_dims=GRASP_LATENT)

        B, S = 4, 10
        torch.manual_seed(5)
        z_t = torch.randn(B, PC_CHANNELS, PC_LATENT)
        z_j = jnp.asarray(z_t.numpy())

        def denoise(x, t, z):
            return jddm.apply(variables, x, t, z)

        rng = jax.random.PRNGKey(11)
        x0_j, traj = diffusion.sample(
            denoise, rng, batch_size=B, z_cond=z_j,
            num_inference_steps=S, sampler="ddim", return_trajectory=True,
        )

        # torch loop from the same x_T with the same schedule constants
        acp = np.asarray(schedule.alphas_cumprod, np.float64)
        T = schedule.num_train_timesteps
        ts = np.asarray(schedule.timestep_grid(S))
        x = torch.from_numpy(np.array(traj[0], np.float32, copy=True))
        with torch.no_grad():
            for t_i in ts:
                prev = int(t_i) - T // S
                eps = tnet(x, time=torch.full((B,), int(t_i)).long(),
                           z_cond=z_t)
                a_t = acp[int(t_i)]
                a_p = acp[prev] if prev >= 0 else 1.0
                x0 = (x - np.sqrt(1.0 - a_t) * eps) / np.sqrt(a_t)
                x0 = torch.clamp(x0, -1.0, 1.0)
                eps_eff = (x - np.sqrt(a_t) * x0) / np.sqrt(1.0 - a_t)
                x = np.sqrt(a_p) * x0 + np.sqrt(1.0 - a_p) * eps_eff
        np.testing.assert_allclose(
            np.asarray(x0_j), x.numpy(), atol=5e-4, rtol=1e-3
        )
