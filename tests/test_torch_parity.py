"""Golden parity: our flax ResNet1D cores vs the reference torch modules.

Runs the reference `grasp_ldm/models/modules/resnets.py` (torch CPU; imports
only torch/einops) with random weights, converts the state dict with
`utils/torch_convert.py`, and asserts numerical agreement of the forward
pass. This is the SURVEY.md §4 golden-value strategy without needing the
published checkpoints.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from graspldm_tpu.models.resnet1d import ResNet1D, TimeConditionedResNet1D
from graspldm_tpu.utils.torch_convert import resnet1d_params_from_torch

REF_RESNETS = "/root/reference/grasp_ldm/models/modules/resnets.py"


@pytest.fixture(scope="module")
def ref_resnets():
    spec = importlib.util.spec_from_file_location("ref_resnets", REF_RESNETS)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_resnets"] = mod
    spec.loader.exec_module(mod)
    return mod


BLOCKS = (8, 16)
DIM = 8
COND = 12


class TestResNet1DParity:
    @pytest.mark.parametrize("cond_channels", [None, 3])
    def test_forward_parity(self, ref_resnets, cond_channels):
        torch.manual_seed(0)
        tmodel = ref_resnets.ResNet1D(
            dim=DIM,
            block_channels=BLOCKS,
            channels=1,
            input_conditioning_dims=COND,
            resnet_block_groups=4,
            dropout=None,
        ).eval()

        B = 3
        x_t = torch.randn(B, 1, DIM)
        if cond_channels is None:
            z_t = torch.randn(B, COND)
        else:
            z_t = torch.randn(B, cond_channels, COND)
        with torch.no_grad():
            want = tmodel(x_t, z_cond=z_t).numpy()

        converted = resnet1d_params_from_torch(
            tmodel.state_dict(), num_blocks=len(BLOCKS)
        )
        jmodel = ResNet1D(
            dim=DIM,
            block_channels=BLOCKS,
            channels=1,
            input_conditioning_dims=COND,
            resnet_block_groups=4,
            dropout=None,
        )
        # my layout: [B, L=dim, C=1]; torch: [B, 1, dim]
        x_j = jnp.asarray(x_t.numpy()).transpose(0, 2, 1)
        got = jmodel.apply(converted, x_j, z_cond=jnp.asarray(z_t.numpy()))
        got = np.asarray(got).transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_time_conditioned_parity(self, ref_resnets):
        torch.manual_seed(1)
        tmodel = ref_resnets.TimeConditionedResNet1D(
            dim=DIM,
            block_channels=BLOCKS,
            channels=1,
            input_conditioning_dims=COND,
            resnet_block_groups=4,
            dropout=None,
            is_time_conditioned=True,
            random_fourier_features=True,
            learned_sinusoidal_dim=16,
        ).eval()

        B = 4
        x_t = torch.randn(B, 1, DIM)
        z_t = torch.randn(B, 3, COND)  # multi-channel conditioning like z_pc
        t_t = torch.randint(0, 1000, (B,)).long()
        with torch.no_grad():
            want = tmodel(x_t, time=t_t, z_cond=z_t).numpy()

        converted = resnet1d_params_from_torch(
            tmodel.state_dict(), num_blocks=len(BLOCKS), time_conditioned=True
        )
        jmodel = TimeConditionedResNet1D(
            dim=DIM,
            block_channels=BLOCKS,
            channels=1,
            input_conditioning_dims=COND,
            resnet_block_groups=4,
            dropout=None,
            random_fourier_features=True,
            learned_sinusoidal_dim=16,
        )
        x_j = jnp.asarray(x_t.numpy()).transpose(0, 2, 1)
        got = jmodel.apply(
            converted,
            x_j,
            time=jnp.asarray(t_t.numpy()),
            z_cond=jnp.asarray(z_t.numpy()),
        )
        got = np.asarray(got).transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=2e-5)
