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
    "fix_state_dict_prefix",
    "convert_conv1d",
    "convert_linear",
    "resnet1d_params_from_torch",
    "pvcnn_encoder_params_from_torch",
    "grasp_cvae_variables_from_torch",
    "grasp_ldm_variables_from_torch",
]


def fix_state_dict_prefix(
    state_dict: Mapping[str, "np.ndarray"], prefix: str = "model",
    ignore_all_others: bool = True,
) -> Dict[str, "np.ndarray"]:
    """Select the ``model.`` or ``ema_model.online_model.`` weight family from
    a dual-prefix checkpoint (reference `utils/torch_utils.py:4-37`,
    consumed at `tools/inference.py:520-524`)."""
    out = {}
    for k, v in state_dict.items():
        head, sep, tail = k.partition(f"{prefix}.")
        if ignore_all_others and not k.startswith(prefix):
            continue
        out[tail] = v
    return out


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


# ---------------------------------------------------------------------------
# PVCNN encoder / GraspCVAE / GraspLatentDDM (full checkpoint key spaces)
# ---------------------------------------------------------------------------


def convert_conv3d(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch Conv3d ``[out, in, kx, ky, kz]`` -> flax ``[kx, ky, kz, in, out]``."""
    w = _np(weight)
    entry = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if bias is not None:
        entry["bias"] = _np(bias)
    return entry


def _convert_norm(sd: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    """torch GroupNorm / BN affine -> flax {scale, bias}."""
    return {"scale": _np(sd[f"{pfx}weight"]), "bias": _np(sd[f"{pfx}bias"])}


def _convert_bn_stats(sd: Mapping, pfx: str) -> Dict[str, np.ndarray]:
    return {
        "mean": _np(sd[f"{pfx}running_mean"]),
        "var": _np(sd[f"{pfx}running_var"]),
    }


def _convert_shared_mlp(sd: Mapping, pfx: str):
    """torch SharedMLP (`shared_mlp.py:6-36`: Conv1d(1x1)+BN+ReLU stacks) ->
    flax SharedMLP {dense_i, bn_i} params + batch_stats."""
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}
    i = 0
    while f"{pfx}layers.{3 * i}.weight" in sd:
        params[f"dense_{i}"] = convert_conv1d_to_dense(
            sd[f"{pfx}layers.{3 * i}.weight"], sd.get(f"{pfx}layers.{3 * i}.bias")
        )
        params[f"bn_{i}"] = _convert_norm(sd, f"{pfx}layers.{3 * i + 1}.")
        stats[f"bn_{i}"] = _convert_bn_stats(sd, f"{pfx}layers.{3 * i + 1}.")
        i += 1
    return params, stats


def _convert_pvconv(sd: Mapping, pfx: str):
    """torch PVConv (`pvconv.py:13-84`) -> flax PVConv params + batch_stats.

    voxel_layers indices: 0 Conv3d, 1 GroupNorm, 2 Swish, [3 Dropout],
    3/4 Conv3d, 4/5 GroupNorm, 5/6 Swish, 6/7 SE3d (when with_se).
    """
    params: Dict[str, dict] = {}
    params["voxel_conv1"] = convert_conv3d(
        sd[f"{pfx}voxel_layers.0.weight"], sd.get(f"{pfx}voxel_layers.0.bias")
    )
    params["voxel_norm1"] = _convert_norm(sd, f"{pfx}voxel_layers.1.")
    # second conv index depends on whether a Dropout module sits at 3
    idx2 = 4 if f"{pfx}voxel_layers.4.weight" in sd else 3
    params["voxel_conv2"] = convert_conv3d(
        sd[f"{pfx}voxel_layers.{idx2}.weight"],
        sd.get(f"{pfx}voxel_layers.{idx2}.bias"),
    )
    params["voxel_norm2"] = _convert_norm(sd, f"{pfx}voxel_layers.{idx2 + 1}.")
    se_idx = idx2 + 3
    if f"{pfx}voxel_layers.{se_idx}.fc.0.weight" in sd:
        params["se"] = {
            "fc1": convert_linear(sd[f"{pfx}voxel_layers.{se_idx}.fc.0.weight"]),
            "fc2": convert_linear(sd[f"{pfx}voxel_layers.{se_idx}.fc.2.weight"]),
        }
    pf_params, pf_stats = _convert_shared_mlp(sd, f"{pfx}point_features.")
    params["point_features"] = pf_params
    return params, {"point_features": pf_stats}


def pvcnn_encoder_params_from_torch(sd: Mapping):
    """Reference PVCNNEncoder state dict (prefix already stripped) -> flax
    ``(params, batch_stats)`` for :class:`graspldm_tpu.models.pvcnn.PVCNNEncoder`.

    Key space: `pc_encoders.py:20-137` + `pvcnn_base.py:15-177`.
    """
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    pvcnn_p: Dict[str, dict] = {}
    pvcnn_s: Dict[str, dict] = {}
    i = 0
    while any(k.startswith(f"pvcnn_modules.point_features.{i}.") for k in sd):
        pfx = f"pvcnn_modules.point_features.{i}."
        if f"{pfx}voxel_layers.0.weight" in sd:
            p, s = _convert_pvconv(sd, pfx)
        else:
            p, s = _convert_shared_mlp(sd, pfx)
        pvcnn_p[f"stage_{i}"] = p
        pvcnn_s[f"stage_{i}"] = s
        i += 1
    if i == 0:
        raise KeyError("no pvcnn_modules.point_features.* keys found")
    # FiLM conditioning layers (conditioned PVCNN, `pvcnn_base.py:60-80`)
    j = 0
    while f"pvcnn_modules.emb_layers.{j}.0.weight" in sd:
        pvcnn_p[f"cond_emb_{j}_1"] = convert_linear(
            sd[f"pvcnn_modules.emb_layers.{j}.0.weight"],
            sd.get(f"pvcnn_modules.emb_layers.{j}.0.bias"),
        )
        pvcnn_p[f"cond_emb_{j}_2"] = convert_linear(
            sd[f"pvcnn_modules.emb_layers.{j}.2.weight"],
            sd.get(f"pvcnn_modules.emb_layers.{j}.2.bias"),
        )
        j += 1
    params["pvcnn"] = pvcnn_p
    stats["pvcnn"] = pvcnn_s

    params["conv_downscale"] = convert_conv1d_to_dense(
        sd["conv_downscale.weight"], sd.get("conv_downscale.bias")
    )
    params["out_conv"] = convert_conv1d_to_dense(
        sd["out_layer.0.weight"], sd.get("out_layer.0.bias")
    )
    params["out_proj"] = convert_linear(
        sd["out_layer.1.weight"], sd.get("out_layer.1.bias")
    )
    return params, stats


def _conditional_core_from_torch(sd: Mapping, pfx: str, num_blocks: int,
                                 with_out_layer: bool):
    """Reference ConditionalGraspPoseEncoder/Decoder core
    (`grasp_vae.py:353-536`) -> flax _ConditionalCore subtree."""
    params: Dict[str, dict] = {
        "in_layer": convert_linear(
            sd[f"{pfx}in_layer.weight"], sd.get(f"{pfx}in_layer.bias")
        )
    }
    net = resnet1d_params_from_torch(
        strip_prefix(sd, f"{pfx}net."), num_blocks=num_blocks
    )
    params["net"] = net["params"]
    if with_out_layer:
        params["out_layer"] = convert_linear(
            sd[f"{pfx}out_layer.weight"], sd.get(f"{pfx}out_layer.bias")
        )
    return params


def grasp_cvae_variables_from_torch(
    state_dict: Mapping[str, np.ndarray], num_core_blocks: int = 4
) -> Dict:
    """Reference GraspCVAE state dict (prefixes stripped) -> flax variables
    ``{params, batch_stats}`` for :class:`graspldm_tpu.models.grasp_vae.GraspCVAE`.

    Key space: `grasp_vae.py:17-574` (encoder.pc_encoder / encoder.
    grasp_encoder / bottleneck / decoder.{in_layer, net, tmrp, class_logits,
    qualities}).
    """
    sd = state_dict
    pc_params, pc_stats = pvcnn_encoder_params_from_torch(
        strip_prefix(sd, "encoder.pc_encoder.")
    )
    params: Dict[str, dict] = {"pc_encoder": pc_params}
    stats: Dict[str, dict] = {"pc_encoder": pc_stats}

    params["grasp_encoder"] = _conditional_core_from_torch(
        sd, "encoder.grasp_encoder.", num_core_blocks, with_out_layer=True
    )
    params["bottleneck"] = {
        "mu": convert_linear(sd["bottleneck.mu.weight"], sd.get("bottleneck.mu.bias")),
        "logvar": convert_linear(
            sd["bottleneck.logvar.weight"], sd.get("bottleneck.logvar.bias")
        ),
    }
    params["decoder_core"] = _conditional_core_from_torch(
        sd, "decoder.", num_core_blocks, with_out_layer=False
    )
    params["head_tmrp"] = convert_linear(
        sd["decoder.tmrp.weight"], sd.get("decoder.tmrp.bias")
    )
    params["head_class"] = convert_linear(
        sd["decoder.class_logits.weight"], sd.get("decoder.class_logits.bias")
    )
    if "decoder.qualities.weight" in sd:
        params["head_qualities"] = convert_linear(
            sd["decoder.qualities.weight"], sd.get("decoder.qualities.bias")
        )
    return {"params": params, "batch_stats": stats}


def grasp_ldm_variables_from_torch(
    state_dict: Mapping[str, np.ndarray], num_blocks: int = 4
) -> Dict:
    """Reference GraspLatentDDM state dict -> flax variables for
    :class:`graspldm_tpu.models.grasp_ldm.GraspLatentDDM` (denoiser only).

    The torch module nests the denoiser at ``diffusion_model.model.``
    (`grasp_ldm.py:58-74`); its VAE lives under ``vae_model.`` in the same
    checkpoint and is converted separately with
    :func:`grasp_cvae_variables_from_torch`.
    """
    sd = strip_prefix(state_dict, "diffusion_model.model.")
    if not sd:
        sd = state_dict  # already a bare denoiser state dict
    net = resnet1d_params_from_torch(sd, num_blocks=num_blocks, time_conditioned=True)
    out = {"params": {"denoiser": net["params"]}}
    if "constants" in net:
        out["constants"] = {"denoiser": net["constants"]}
    return out
