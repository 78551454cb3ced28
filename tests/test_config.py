"""Config system tests: exec, inheritance, _delete_, registries."""

import os
import textwrap

import pytest

from graspldm_tpu.config import (
    AUGMENTATIONS,
    DATASETS,
    LOSSES,
    Config,
    ConfigDict,
    Registry,
    build_from_cfg,
)


class TestConfigFile:
    def test_exec_and_attr_access(self, tmp_path):
        p = tmp_path / "cfg.py"
        p.write_text("a = 1\nb = dict(c=dict(d=2))\n_private = 3\n")
        cfg = Config.fromfile(str(p))
        assert cfg.a == 1
        assert cfg.b.c.d == 2
        assert cfg.get_path("b.c.d") == 2
        assert cfg.get_path("b.x", "fallback") == "fallback"
        assert "filename" in cfg

    def test_base_inheritance_merge(self, tmp_path):
        (tmp_path / "base.py").write_text(
            "x = 1\nnested = dict(a=1, b=2)\nonly_base = True\n"
        )
        (tmp_path / "child.py").write_text(
            "_base_ = ['base.py']\nx = 10\nnested = dict(b=20, c=30)\n"
        )
        cfg = Config.fromfile(str(tmp_path / "child.py"))
        assert cfg.x == 10
        assert cfg.only_base is True
        assert cfg.nested == {"a": 1, "b": 20, "c": 30}

    def test_delete_replaces(self, tmp_path):
        (tmp_path / "base.py").write_text("d = dict(a=1, b=2)\n")
        (tmp_path / "child.py").write_text(
            "_base_ = ['base.py']\nd = dict(_delete_=True, c=3)\n"
        )
        cfg = Config.fromfile(str(tmp_path / "child.py"))
        assert cfg.d == {"c": 3}

    def test_shipped_configs_load(self):
        root = os.path.join(os.path.dirname(__file__), "..", "graspldm_tpu", "configs")
        fpc = Config.fromfile(os.path.join(root, "fpc_1a_latentc3_z4_pc64_180k.py"))
        assert fpc.flagship_args["grasp_latent_size"] == 4
        assert fpc.flagship_args["pc_latent_size"] == 64
        assert fpc.max_steps == 180_000
        ppc = Config.fromfile(
            os.path.join(
                root, "ppc_1a_partial_63cat8k_filtered_latentc3_z16_pc256_180k.py"
            )
        )
        assert ppc.flagship_args["grasp_latent_size"] == 16
        assert ppc.flagship_args["pc_latent_size"] == 256
        assert ppc.batch_size == 60
        assert ppc.data["train"]["type"] == "AcronymPartialPointclouds"


class TestRegistry:
    def test_register_and_build(self):
        reg = Registry("test")

        @reg.register
        class Thing:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = build_from_cfg({"type": "Thing", "args": {"a": 1}}, reg)
        assert obj.a == 1 and obj.b == 2
        with pytest.raises(KeyError):
            reg.get("Missing")
        with pytest.raises(KeyError):
            reg.register(Thing)  # duplicate

    def test_builtin_registries_populated(self):
        import graspldm_tpu.data  # noqa: F401  (registers datasets/augs)
        import graspldm_tpu.losses  # noqa: F401

        assert "AcronymShapenetPointclouds" in DATASETS
        assert "AcronymPartialPointclouds" in DATASETS
        assert "AcronymGraspPointsDataset" in DATASETS
        assert "RandomRotation" in AUGMENTATIONS
        assert "VAELatentLoss" in LOSSES
        assert "GraspReconstructionLoss" in LOSSES
