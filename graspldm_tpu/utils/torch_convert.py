"""PyTorch checkpoint -> flax parameter conversion.

Maps the reference's state-dict key space (ResNet1D / TimeConditionedResNet1D
layouts from `grasp_ldm/models/modules/resnets.py`, checkpoint prefixes
`model.` / `ema_model.online_model.` handled like
`grasp_ldm/utils/torch_utils.py:4-37`) onto this framework's flax trees.

Conventions:
  * torch Conv1d weight ``[out, in, k]``  -> flax kernel ``[k, in, out]``
  * torch Linear weight ``[out, in]``     -> flax kernel ``[in, out]``
  * torch GroupNorm/LayerNorm weight/bias -> flax scale/bias
  * the reference ResNet1D's torch channel axis is this framework's
    feature-last channel axis (layouts are transposed, weights map 1:1).

Used both for golden-parity tests against the reference modules run on torch
CPU and for importing published GraspLDM checkpoints.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = [
    "strip_prefix",
    "convert_conv1d",
    "convert_linear",
    "resnet1d_params_from_torch",
]


def strip_prefix(state_dict: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select keys under ``prefix`` and strip it (ckpt prefix handling)."""
    out = {}
    plen = len(prefix)
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[plen:]] = v
    return out


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_conv1d(weight, bias=None) -> Dict[str, np.ndarray]:
    w = _np(weight)  # [out, in, k]
    entry = {"kernel": np.transpose(w, (2, 1, 0))}
    if bias is not None:
        entry["bias"] = _np(bias)
    return entry


def convert_linear(weight, bias=None) -> Dict[str, np.ndarray]:
    w = _np(weight)  # [out, in]
    entry = {"kernel": np.transpose(w, (1, 0))}
    if bias is not None:
        entry["bias"] = _np(bias)
    return entry


def _convert_resnet_block(sd: Mapping, pfx: str) -> Dict[str, dict]:
    """torch ResnetBlock -> flax ResnetBlock1D params."""
    out: Dict[str, dict] = {}
    if f"{pfx}mlp.1.weight" in sd:
        out["mlp_dense"] = convert_linear(
            sd[f"{pfx}mlp.1.weight"], sd.get(f"{pfx}mlp.1.bias")
        )
    for tb, fb in (("block1", "block1"), ("block2", "block2")):
        out[fb] = {
            "proj": convert_conv1d(
                sd[f"{pfx}{tb}.proj.weight"], sd.get(f"{pfx}{tb}.proj.bias")
            ),
            "norm": {
                "scale": _np(sd[f"{pfx}{tb}.norm.weight"]),
                "bias": _np(sd[f"{pfx}{tb}.norm.bias"]),
            },
        }
    if f"{pfx}res_conv.weight" in sd:
        out["res_conv"] = convert_conv1d(
            sd[f"{pfx}res_conv.weight"], sd.get(f"{pfx}res_conv.bias")
        )
    return out


def convert_conv1d_to_dense(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch Conv1d with kernel_size 1 -> flax Dense kernel ``[in, out]``."""
    w = _np(weight)  # [out, in, 1]
    assert w.shape[-1] == 1, "expected a 1x1 conv"
    entry = {"kernel": np.transpose(w[..., 0], (1, 0))}
    if bias is not None:
        entry["bias"] = _np(bias)
    return entry


def _convert_linear_attention(sd: Mapping, pfx: str) -> Dict[str, dict]:
    # to_qkv / to_out are Dense layers in the flax modules (1x1 convs in torch)
    return {
        "to_qkv": convert_conv1d_to_dense(sd[f"{pfx}to_qkv.weight"]),
        "to_out": convert_conv1d_to_dense(
            sd[f"{pfx}to_out.0.weight"], sd.get(f"{pfx}to_out.0.bias")
        ),
        "out_norm": {"g": _np(sd[f"{pfx}to_out.1.g"]).reshape(-1)},
    }


def resnet1d_params_from_torch(
    state_dict: Mapping[str, np.ndarray],
    num_blocks: int,
    time_conditioned: bool = False,
) -> Dict:
    """Convert a reference (Time)ResNet1D state dict to flax params/constants.

    Returns ``{"params": ..., "constants": ...}`` matching
    :class:`graspldm_tpu.models.resnet1d.ResNet1D` /
    :class:`...TimeConditionedResNet1D` trees.
    """
    sd = state_dict
    core: Dict[str, dict] = {
        "init_conv": convert_conv1d(sd["init_conv.weight"], sd.get("init_conv.bias"))
    }
    for i in range(num_blocks):
        core[f"blocks_{i}_res1"] = _convert_resnet_block(sd, f"blocks.{i}.0.")
        core[f"blocks_{i}_res2"] = _convert_resnet_block(sd, f"blocks.{i}.1.")
        # Residual(PreNorm(LinearAttention)): fn.norm.g, fn.fn.*
        core[f"blocks_{i}_attn_norm"] = {
            "g": _np(sd[f"blocks.{i}.2.fn.norm.g"]).reshape(-1)
        }
        core[f"blocks_{i}_attn"] = _convert_linear_attention(sd, f"blocks.{i}.2.fn.fn.")
        core[f"blocks_{i}_proj"] = convert_conv1d(
            sd[f"blocks.{i}.3.weight"], sd.get(f"blocks.{i}.3.bias")
        )
    core["final_res_block"] = _convert_resnet_block(sd, "final_res_block.")
    core["final_conv"] = convert_conv1d(
        sd["final_conv.weight"], sd.get("final_conv.bias")
    )

    params: Dict[str, dict] = {"core": core}
    constants: Dict[str, dict] = {}

    if "input_emb_layers.0.weight" in sd:
        params["input_emb"] = convert_linear(
            sd["input_emb_layers.0.weight"], sd.get("input_emb_layers.0.bias")
        )
    if time_conditioned:
        params["time_mlp_1"] = convert_linear(
            sd["time_mlp.1.weight"], sd.get("time_mlp.1.bias")
        )
        params["time_mlp_2"] = convert_linear(
            sd["time_mlp.3.weight"], sd.get("time_mlp.3.bias")
        )
        if "time_mlp.0.weights" in sd:
            # RandomOrLearnedSinusoidalPosEmb weights: frozen constants when
            # random Fourier features are used (the shipped configs).
            constants["sinu_pos_emb"] = {"weights": _np(sd["time_mlp.0.weights"])}

    out = {"params": params}
    if constants:
        out["constants"] = constants
    return out
