"""Multi-host training bootstrap: 2-process CPU run == single-process run.

The contract (reference num_nodes/DDP, `grasp_ldm/trainers/trainer.py:43,
204-224`): with `jax.distributed.initialize`, per-process dataset slices and
`jax.make_array_from_process_local_data` global-batch assembly, a 2-process
x 4-device run trains IDENTICALLY to a 1-process x 8-device run on the same
global batches — the jitted step is one SPMD program either way and XLA's
gradient all-reduce replaces DDP.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent(
    """
    import os, sys

    mode = sys.argv[1]        # "multi" | "single"
    out_root = sys.argv[2]
    pid = int(sys.argv[3])
    port = sys.argv[4]

    import jax

    if mode == "multi":
        from graspldm_tpu.parallel.distributed import initialize

        initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
        assert jax.process_count() == 2
        assert jax.device_count() == 8
        assert jax.local_device_count() == 4

    import numpy as np

    from graspldm_tpu.flagship import FlagshipConfig
    from graspldm_tpu.parallel import make_mesh
    from graspldm_tpu.training.experiment import Experiment
    from graspldm_tpu.training.trainer import GraspGenerationTrainer

    cfg = FlagshipConfig(
        pc_num_points=32, pc_latent_size=8, pc_latent_channels=3,
        grasp_latent_size=4, block_channels=(8, 16), resnet_block_groups=4,
        dropout=None, pc_scale_channels=0.25, pc_scale_voxel_resolution=0.25,
        diffusion_timesteps=50,
    )
    # deterministic GLOBAL batches, identical in both topologies
    rng0 = np.random.default_rng(0)
    B, N, G = 8, 32, 2
    batches = [
        {
            "pc": rng0.normal(size=(B, N, 3)).astype(np.float32),
            "grasps": rng0.normal(size=(B, G, 7)).astype(np.float32),
        }
        for _ in range(3)
    ]

    mesh = make_mesh()  # global devices
    exp = Experiment(out_root, "mp_parity", "vae")
    trainer = GraspGenerationTrainer(
        experiment=exp, model_cfg=cfg, stage="vae", mesh=mesh,
        log_every=1, ckpt_every=100,
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    if mode == "multi":
        half = B // 2
        feed = [
            {k: v[pid * half : (pid + 1) * half] for k, v in b.items()}
            for b in batches
        ]
    else:
        feed = batches
    trainer.fit(state, iter(feed), 3, jax.random.PRNGKey(1))
    print("DONE", mode, pid)
    """
)


def _run(mode, out_root, pid, port, tmp_path, device_count):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the axon site hook off
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={device_count}"
    )
    env["PYTHONPATH"] = REPO
    script = tmp_path / "mp_script.py"
    script.write_text(SCRIPT)
    return subprocess.Popen(
        [sys.executable, str(script), mode, out_root, str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )


def _losses(out_root):
    path = os.path.join(out_root, "mp_parity", "vae", "logs", "metrics.jsonl")
    with open(path) as f:
        recs = [json.loads(line) for line in f]
    return {r["step"]: r["loss"] for r in recs if "loss" in r}


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    multi_root = str(tmp_path / "out_multi")
    procs = [
        _run("multi", multi_root, pid, port, tmp_path, device_count=4)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"multi-process run failed:\n{out[-4000:]}"

    single_root = str(tmp_path / "out_single")
    p = _run("single", single_root, 0, port, tmp_path, device_count=8)
    out = p.communicate(timeout=900)[0]
    assert p.returncode == 0, f"single-process run failed:\n{out[-4000:]}"

    multi = _losses(multi_root)
    single = _losses(single_root)
    assert set(multi) == set(single) == {1, 2, 3}
    for step in (1, 2, 3):
        np.testing.assert_allclose(
            multi[step], single[step], rtol=2e-4, atol=2e-5,
            err_msg=f"loss diverged at step {step}",
        )
    # only process 0 wrote checkpoints/logs
    assert os.path.exists(
        os.path.join(multi_root, "mp_parity", "vae", "checkpoints", "last")
    )
