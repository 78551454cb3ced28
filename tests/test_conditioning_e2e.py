"""Task conditioning (class / region) and the elucidated (EDM) stage,
end-to-end: dataset region metas -> conditioned denoiser -> trainer ->
checkpointed inference.

Covers the reference's conditioning modes (`tools/inference.py:330-398`) and
the elucidated experiment plumbing (`tools/inference.py:463-490`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY_FLAGSHIP = dict(
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


def test_compute_pc_regions_properties():
    from graspldm_tpu.data.acronym import compute_pc_regions

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(256, 3)).astype(np.float32)
    regions, seeds = compute_pc_regions(pc, 4, 32, rng)
    assert regions.shape == (4, 32, 3)
    assert seeds.shape == (4, 3)
    # every region point is an actual pc point
    flat = regions.reshape(-1, 3)
    d = np.linalg.norm(flat[:, None, :] - pc[None], axis=-1).min(axis=1)
    assert d.max() == 0.0
    # each region's points are nearest to its own seed
    d_seed = np.linalg.norm(
        regions[:, :, None, :] - seeds[None, None], axis=-1
    )  # [R, P, R]
    own = np.take_along_axis(
        d_seed, np.arange(4)[:, None, None], axis=-1
    )[..., 0]
    assert np.all(own <= d_seed.min(axis=-1) + 1e-6)


def test_region_conditioned_denoiser_responds_to_region():
    from graspldm_tpu.flagship import FlagshipConfig, build_flagship

    cfg = FlagshipConfig(
        **TINY_FLAGSHIP, conditioning="region", region_num_points=16
    )
    _, ddm, _ = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    BG = 4
    x = jax.random.normal(rng, (BG, 1, cfg.grasp_latent_size))
    t = jnp.zeros((BG,), jnp.int32)
    zc = jax.random.normal(
        rng, (BG, cfg.pc_latent_channels, cfg.pc_latent_size)
    )
    r0 = jnp.zeros((BG, 16, 3))
    r1 = jnp.ones((BG, 16, 3))
    variables = ddm.init({"params": rng, "dropout": rng}, x, t, zc, r0)
    e0 = ddm.apply(variables, x, t, zc, r0)
    e0b = ddm.apply(variables, x, t, zc, r0)
    e1 = ddm.apply(variables, x, t, zc, r1)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e0b))
    assert float(jnp.abs(e0 - e1).max()) > 1e-5


def _train_two_stages(tmp_path, root, stage2, flagship_kwargs,
                      region_metas=False):
    """Train tiny vae + the given stage-2 on the synthetic fixture."""
    from graspldm_tpu.data import AcronymShapenetPointclouds
    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.training import EMAConfig
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.trainer import GraspGenerationTrainer

    model_cfg = FlagshipConfig(**TINY_FLAGSHIP, **flagship_kwargs)
    ds_kwargs = dict(
        data_root_dir=root,
        batch_num_points_per_pc=64,
        batch_num_grasps_per_pc=8,
        split="train",
        batch_failed_grasps_ratio=0.0,
        min_num_grasps=4,
        num_repeat_dataset=4,
    )
    if region_metas:
        ds_kwargs.update(
            return_region_metas=True,
            num_regions=2,
            region_num_points=model_cfg.region_num_points,
        )
    dataset = AcronymShapenetPointclouds(**ds_kwargs)
    out_root = str(tmp_path / "output")
    rng = jax.random.PRNGKey(0)

    # self-describing experiment dir: inference rebuilds the model from the
    # copied config, so it must carry the tiny flagship + dataset args
    flag = dict(TINY_FLAGSHIP, **flagship_kwargs)
    cfg_path = str(tmp_path / "tiny_cond.py")
    with open(cfg_path, "w") as f:
        f.write(f"flagship_args = {flag!r}\n")
        f.write(
            "data = dict(train=dict(type='AcronymShapenetPointclouds', "
            f"args={ds_kwargs!r}))\n"
        )

    def batches():
        while True:
            for b in dataset.batches(2):
                out = {"pc": b["pc"], "grasps": b["grasps"]}
                metas = b.get("metas") or {}
                if "region_points" in metas:
                    out["region_points"] = metas["region_points"]
                    out["grasp_region_labels"] = metas["grasp_region_labels"]
                yield out

    for stage in ("vae", stage2):
        exp = Experiment(out_root, "tiny_cond", stage)
        exp.copy_config(cfg_path)
        trainer = GraspGenerationTrainer(
            experiment=exp,
            model_cfg=model_cfg,
            stage=stage,
            ema_cfg=EMAConfig(beta=0.99, update_after_step=1),
            log_every=2,
            ckpt_every=2,
        )
        example = next(dataset.batches(2))
        state = trainer.init_state(rng, example)
        frozen = None
        if stage != "vae":
            frozen = trainer.load_frozen_vae(rng, example)
        trainer.fit(state, batches(), 4, rng, frozen)
    return os.path.join(out_root, "tiny_cond"), dataset


@pytest.mark.slow
def test_region_conditioned_end_to_end(tmp_path):
    """VERDICT item 5: condition on two different regions of one cloud and
    get measurably different grasp translations."""
    from graspldm_tpu.data import make_synthetic_acronym
    from graspldm_tpu.inference.runner import InferenceLDM

    root = make_synthetic_acronym(str(tmp_path / "acr"))
    exp_path, _ = _train_two_stages(
        tmp_path, root, "ddm",
        dict(conditioning="region", region_num_points=16),
        region_metas=True,
    )

    runner = InferenceLDM(exp_path, data_root=root, split="test",
                          num_inference_steps=10)
    assert runner.dataset.return_region_metas
    key = jax.random.PRNGKey(3)

    # one fixed dataset item (the dataset resamples the pc per access, so
    # pin pc/metas and drive generate() directly for exact comparisons)
    item = runner.get_item(0)
    pc = jnp.asarray(item["pc"])[None]
    meta = runner._meta_from_item(item["metas"])
    r0 = runner.generate(pc, 6, key, meta, region_id=0,
                         item_metas=item["metas"])
    r0b = runner.generate(pc, 6, key, meta, region_id=0,
                          item_metas=item["metas"])
    r1 = runner.generate(pc, 6, key, meta, region_id=1,
                         item_metas=item["metas"])

    # same region + same key reproduces exactly; different region moves the
    # generated translations measurably
    np.testing.assert_allclose(r0["grasp_tmrp"], r0b["grasp_tmrp"])
    t0 = r0["grasp_tmrp"][0, :, :3]
    t1 = r1["grasp_tmrp"][0, :, :3]
    assert float(np.abs(t0 - t1).max()) > 1e-4

    # conditioning validation: wrong mode raises a clear error
    with pytest.raises(ValueError, match="region-conditioned"):
        runner.infer(0, num_grasps=2, rng=key, cls_cond=1.0)
    with pytest.raises(ValueError, match="pass region_id"):
        runner.infer(0, num_grasps=2, rng=key)


@pytest.mark.slow
def test_class_conditioned_inference_path(tmp_path):
    """ADVICE item: --conditioning class must reach a class-conditioned
    denoiser instead of raising TypeError, and unconditional checkpoints
    must reject conditioning with a clear error."""
    from graspldm_tpu.data import make_synthetic_acronym
    from graspldm_tpu.inference.runner import InferenceLDM

    root = make_synthetic_acronym(str(tmp_path / "acr"))

    # class-conditioned model: cls_cond flows through training + inference
    from graspldm_tpu.flagship import FlagshipConfig, build_flagship
    from graspldm_tpu.inference.pipeline import ldm_generate
    from graspldm_tpu.training import init_train_state, make_ddm_train_step
    from graspldm_tpu.training.optim import build_optimizer
    from graspldm_tpu.training.trainer import _conditioning_example

    cfg = FlagshipConfig(**TINY_FLAGSHIP, conditioning="class")
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    tx = build_optimizer(1e-3)
    B, G, N = 2, 4, 64
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

    step = jax.jit(make_ddm_train_step(vae, ddm, diffusion, tx))
    batch = {
        "pc": pc,
        "grasps": grasps,
        "cls_cond": jnp.zeros((B, G)),
    }
    ddm_state, metrics = step(ddm_state, batch, rng, vae_vars)
    assert np.isfinite(float(metrics["loss"]))

    ddm_vars = {"params": ddm_state.params}
    if ddm_state.constants is not None:
        ddm_vars["constants"] = ddm_state.constants
    out = ldm_generate(
        vae, vae_vars, ddm, ddm_vars, diffusion,
        pc[:1], 4, rng, num_inference_steps=5,
        cls_cond=jnp.ones((4,)),
    )
    assert out["grasps"].shape == (1, 4, 4, 4)

    # unconditional checkpoint rejects class conditioning cleanly
    exp_path, _ = _train_two_stages(tmp_path, root, "ddm", {})
    runner = InferenceLDM(exp_path, data_root=root, split="test",
                          num_inference_steps=5)
    with pytest.raises(ValueError, match="unconditional"):
        runner.infer(0, num_grasps=2, rng=rng, cls_cond=1.0)


@pytest.mark.slow
def test_elucidated_stage_end_to_end(tmp_path):
    """VERDICT item 4: elucidated_ddm trainer stage + DPM++ inference."""
    from graspldm_tpu.data import make_synthetic_acronym
    from graspldm_tpu.inference.runner import InferenceLDM

    root = make_synthetic_acronym(str(tmp_path / "acr"))
    exp_path, _ = _train_two_stages(
        tmp_path, root, "elucidated_ddm", dict(edm_num_sample_steps=8)
    )
    assert os.path.isdir(os.path.join(exp_path, "elucidated_ddm"))

    runner = InferenceLDM(exp_path, data_root=root, split="test")
    assert runner.ddm_mode == "elucidated_ddm"
    assert runner.sampler == "dpmpp"  # auto-selected fast sampler
    assert runner.num_inference_steps == 8
    res = runner.infer(0, num_grasps=4, rng=jax.random.PRNGKey(1))
    assert res["grasps"].shape == (1, 4, 4, 4)
    assert np.all(np.isfinite(res["grasp_tmrp"]))
    dets = np.linalg.det(res["grasps"][0, :, :3, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)

    # the stochastic churn sampler also runs on the same checkpoint
    runner2 = InferenceLDM(exp_path, data_root=root, split="test",
                           sampler="churn", num_inference_steps=6)
    res2 = runner2.infer(0, num_grasps=3, rng=jax.random.PRNGKey(2))
    assert np.all(np.isfinite(res2["grasp_tmrp"]))
