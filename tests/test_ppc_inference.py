"""Partial-pc experiment end to end: train tiny ppc stages, then run
inference/eval through the registry-built PARTIAL dataset.

Locks in the registry-driven dataset build in
:class:`graspldm_tpu.inference.runner.InferenceBase` (the reference's
inference patches the train config's dataset the same way,
`tools/inference.py:184-196`) — before it, ppc experiments could train but
not infer/evaluate (the runner hardcoded the full-pc dataset class).
"""

import os

import jax
import numpy as np
import pytest

PPC_CONFIG_TEXT = """
max_steps = 4
batch_size = 2
seed = 0
root_data_dir = {root!r}

flagship_args = dict(
    pc_num_points=128,
    pc_latent_size=16,
    pc_latent_channels=3,
    grasp_latent_size=8,
    grasp_representation_dims=7,
    block_channels=(8, 16),
    resnet_block_groups=4,
    dropout=0.1,
    pc_scale_channels=0.25,
    pc_scale_voxel_resolution=0.25,
    diffusion_timesteps=50,
)

data = dict(
    train=dict(
        type="AcronymPartialPointclouds",
        args=dict(
            data_root_dir=root_data_dir,
            num_points_per_pc=128,
            num_grasps_per_obj=8,
            split="train",
            min_usable_pc_points=64,
            num_repeat_dataset=2,
        ),
    ),
)

optimizer = dict(initial_lr=1e-3, grad_clip=0.5)
trainer = dict(max_steps=max_steps, batch_size=batch_size,
               log_every_n_steps=2, ema=dict(beta=0.99, update_after_step=1))
"""


@pytest.mark.slow
def test_ppc_train_and_infer(tmp_path):
    from graspldm_tpu.config import Config
    from graspldm_tpu.data.synthetic import make_synthetic_partial_scenes
    from graspldm_tpu.data.partial import AcronymPartialPointclouds
    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.training import EMAConfig
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.trainer import GraspGenerationTrainer

    root = str(tmp_path / "partial")
    make_synthetic_partial_scenes(root, num_scenes=2, cams_per_scene=1,
                                  grasps_per_scene=16)
    cfg_path = str(tmp_path / "ppc_tiny.py")
    with open(cfg_path, "w") as f:
        f.write(PPC_CONFIG_TEXT.format(root=root))

    cfg = Config.fromfile(cfg_path)
    model_cfg = FlagshipConfig(**cfg.flagship_args)
    dataset = AcronymPartialPointclouds(**cfg.data["train"]["args"])
    out_root = str(tmp_path / "output")
    rng = jax.random.PRNGKey(0)

    def run_stage(stage):
        exp = Experiment(out_root, "ppc_tiny", stage)
        exp.copy_config(cfg_path)
        trainer = GraspGenerationTrainer(
            experiment=exp,
            model_cfg=model_cfg,
            stage=stage,
            optimizer_cfg=cfg.optimizer,
            ema_cfg=EMAConfig(beta=0.99, update_after_step=1),
            log_every=2,
            ckpt_every=2,
        )
        example = next(dataset.batches(cfg.batch_size))
        state = trainer.init_state(rng, example)
        frozen = None
        if stage == "ddm":
            frozen = trainer.load_frozen_vae(rng, example)

        def batches():
            while True:
                yield from dataset.batches(cfg.batch_size)

        trainer.fit(state, batches(), cfg.max_steps, rng, frozen)

    run_stage("vae")
    run_stage("ddm")

    from graspldm_tpu.inference.runner import InferenceLDM

    exp_path = os.path.join(out_root, "ppc_tiny")
    runner = InferenceLDM(exp_path, data_root=root, split="train",
                          num_inference_steps=5)
    # the registry built the PARTIAL dataset from the config
    assert type(runner.dataset).__name__ == "AcronymPartialPointclouds"
    res = runner.infer(0, num_grasps=4, rng=jax.random.PRNGKey(2))
    assert res["grasps"].shape == (1, 4, 4, 4)
    assert np.all(np.isfinite(res["grasp_tmrp"]))

    # generation-quality metrics run on the partial experiment too
    from graspldm_tpu.metrics import evaluate_against_ground_truth

    m = evaluate_against_ground_truth(runner, indices=[0, 1], num_grasps=4,
                                      rng=jax.random.PRNGKey(3))
    assert np.isfinite(m["coverage"])


def test_set_normalization_params_override():
    """Custom normalization for raw-pc inference
    (`grasp_ldm/inference/inference_base.py:103-131`): the override's
    shift/scale are applied to the input cloud and inverted on outputs."""
    import jax.numpy as jnp

    from graspldm_tpu.inference.runner import InferenceBase

    captured = {}

    class Probe(InferenceBase):
        def __init__(self):  # bypass checkpoint loading
            pass

        def generate(self, pc, num_grasps, rng, meta, **kwargs):
            captured["pc_n"] = np.asarray(pc)
            captured["meta"] = meta
            return {}

    p = Probe()
    p.set_normalization_params(
        pc_shift=[1.0, 2.0, 3.0], translation_scale=0.1, rotation_scale=0.25
    )
    raw = np.tile(np.array([[1.0, 2.0, 3.0]]), (8, 1)) + 0.05
    p.infer_on_pointcloud(raw, 4, jax.random.PRNGKey(0))
    np.testing.assert_allclose(captured["pc_n"], 0.5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(captured["meta"].grasp_std[0]),
        [0.1, 0.1, 0.1, 0.25, 0.25, 0.25],
    )
