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


class TestTemplateVarsAndOverrides:
    def test_predefined_template_vars(self, tmp_path):
        """`{{ fileDirname }}`-style substitution before execution
        (reference `utils/config.py:107-127`)."""
        p = tmp_path / "tmpl_cfg.py"
        p.write_text(
            'root_data_dir = "{{ fileDirname }}/data"\n'
            'exp = "{{fileBasenameNoExtension}}"\n'
            'full = "{{ fileBasename }}"\n'
            'ext = "{{ fileExtname }}"\n'
        )
        cfg = Config.fromfile(str(p))
        assert cfg.root_data_dir == str(tmp_path) + "/data"
        assert cfg.exp == "tmpl_cfg"
        assert cfg.full == "tmpl_cfg.py"
        assert cfg.ext == ".py"

    def test_template_vars_in_base(self, tmp_path):
        (tmp_path / "base.py").write_text('data_dir = "{{ fileDirname }}"\n')
        (tmp_path / "child.py").write_text('_base_ = "base.py"\nx = 1\n')
        cfg = Config.fromfile(str(tmp_path / "child.py"))
        assert cfg.data_dir == str(tmp_path)
        assert cfg.x == 1

    def test_base_var_substitution(self, tmp_path):
        """`{{ _base_.x }}` placeholders resolve against the merged base
        configs (reference `utils/config.py:129-176`), including nested
        dotted paths, non-string values, and placement inside containers."""
        (tmp_path / "base.py").write_text(
            "batch_size = 10\n"
            "data = dict(num_points=1024, root='/data')\n"
        )
        (tmp_path / "child.py").write_text(
            "_base_ = ['base.py']\n"
            "eval_batch = {{ _base_.batch_size }}\n"
            "model = dict(n_pts={{ _base_.data.num_points }},\n"
            "             roots=[{{ _base_.data.root }}])\n"
        )
        cfg = Config.fromfile(str(tmp_path / "child.py"))
        assert cfg.eval_batch == 10
        assert cfg.model.n_pts == 1024
        assert cfg.model.roots == ["/data"]
        # the substituted value keeps the base's type, not a string
        assert isinstance(cfg.eval_batch, int)

    def test_base_var_chained_inheritance(self, tmp_path):
        """A base file may itself use `{{ _base_.x }}` of its own base."""
        (tmp_path / "root.py").write_text("n = 4\n")
        (tmp_path / "mid.py").write_text(
            "_base_ = 'root.py'\nm = dict(k={{ _base_.n }})\n"
        )
        (tmp_path / "leaf.py").write_text(
            "_base_ = 'mid.py'\nout = {{ _base_.m.k }}\n"
        )
        cfg = Config.fromfile(str(tmp_path / "leaf.py"))
        assert cfg.out == 4 and cfg.m["k"] == 4

    def test_base_var_unresolvable_raises(self, tmp_path):
        (tmp_path / "base.py").write_text("x = 1\n")
        (tmp_path / "child.py").write_text(
            "_base_ = 'base.py'\ny = {{ _base_.missing }}\n"
        )
        with pytest.raises(KeyError, match="_base_.missing"):
            Config.fromfile(str(tmp_path / "child.py"))

    def test_merge_from_dict_dotted(self):
        from graspldm_tpu.config import merge_from_dict

        cfg = ConfigDict(
            dict(
                optimizer=dict(initial_lr=1e-3, grad_clip=0.5),
                trainer=dict(ema=dict(beta=0.99)),
            )
        )
        out = merge_from_dict(
            cfg,
            {"optimizer.initial_lr": 5e-4, "trainer.ema.beta": 0.995,
             "trainer.new_key": 7},
        )
        assert out.optimizer.initial_lr == 5e-4
        assert out.optimizer.grad_clip == 0.5  # untouched siblings survive
        assert out.trainer.ema.beta == 0.995
        assert out.trainer.new_key == 7
        assert cfg.optimizer.initial_lr == 1e-3  # source not mutated

    def test_merge_from_dict_list_index(self):
        from graspldm_tpu.config import merge_from_dict

        cfg = ConfigDict(
            dict(pipeline=[dict(type="A"), dict(type="B", k=1)])
        )
        out = merge_from_dict(cfg, {"pipeline.0.type": "C"})
        assert out.pipeline[0]["type"] == "C"
        assert out.pipeline[1] == dict(type="B", k=1)
        with pytest.raises(KeyError):
            merge_from_dict(cfg, {"pipeline.5.type": "X"})

    def test_parse_cfg_options(self):
        from graspldm_tpu.config import parse_cfg_options

        opts = parse_cfg_options(
            ["a.b=5e-4", "c=true", "d=none", "e=1,2,3", "f=hello",
             "g=[1, 2]", "h='x,y'"]
        )
        assert opts["a.b"] == 5e-4
        assert opts["c"] is True
        assert opts["d"] is None
        assert opts["e"] == [1, 2, 3]
        assert opts["f"] == "hello"
        assert opts["g"] == [1, 2]
        assert opts["h"] == "x,y"
        with pytest.raises(ValueError):
            parse_cfg_options(["novalue"])
