"""Partial point-cloud config (z16, pc256, 180k steps).

Mirror of the reference experiment
`configs/generation/partial_pc/ppc_1a_partial_63cat8k_filtered_latentc3_z16_pc256_180k.py`:
same PVCNN scaling; larger latents (grasp 16, pc [3, 256]); depth-rendered
partial clouds back-projected with the D435i dummy camera; batch 60.
"""

_base_ = ["fpc_1a_latentc3_z4_pc64_180k.py"]

max_steps = 180_000
batch_size = 60

root_data_dir = "data/acronym/renders/objects_filtered_grasps_63cat_8k/"

pc_num_points = 1024
pc_latent_dims = 256
pc_latent_channels = 3
grasp_latent_dims = 16

flagship_args = dict(
    pc_num_points=pc_num_points,
    pc_latent_size=pc_latent_dims,
    pc_latent_channels=pc_latent_channels,
    grasp_latent_size=grasp_latent_dims,
    grasp_representation_dims=7,
    num_output_qualities=None,
    block_channels=(32, 64, 128, 256),
    resnet_block_groups=4,
    dropout=0.1,
    pc_scale_channels=0.75,
    pc_scale_voxel_resolution=0.75,
    diffusion_timesteps=1000,
    beta_start=5e-5,
    beta_end=1e-3,
    beta_schedule="linear",
    variance_type="fixed_large",
    diffusion_loss="l2",
)

augs_config = [
    dict(type="RandomRotation", args=dict(p=0.5, max_angle=180, is_degree=True)),
    dict(type="PointcloudJitter", args=dict(p=1, sigma=0.005, clip=0.005)),
    dict(type="RandomPointcloudDropout", args=dict(p=0.5, max_dropout_ratio=0.4)),
]

data = dict(
    _delete_=True,
    train=dict(
        type="AcronymPartialPointclouds",
        args=dict(
            data_root_dir=root_data_dir,
            num_points_per_pc=pc_num_points,
            num_grasps_per_obj=100,
            augs_config=augs_config,
            split="train",
            depth_px_scale=10000,
            scene_prefix="scene_",
            min_usable_pc_points=1024,
            use_failed_grasps=False,
            failed_grasp_ratio=0.3,
            num_repeat_dataset=10,
        ),
    ),
)

trainer = dict(
    max_steps=max_steps,
    batch_size=batch_size,
    log_every_n_steps=100,
    ema=dict(beta=0.990, update_after_step=1000),
    # metric logger (W&B preferred; JSONL fallback when unavailable)
    logger=dict(type="WandbLogger", project="graspldm-tpu"),
    # periodic in-training generation eval on held-out test scenes; the
    # `best` checkpoint follows this score instead of train loss
    eval_every=5000,
    eval=dict(split="test", num_objects=8, num_grasps=64, num_steps=25),
    # keep the top-3 checkpoints by windowed loss next to last/best
    keep_top_k=3,
)
