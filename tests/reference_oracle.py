"""Import the REAL reference torch modules from /root/reference on CPU.

The reference JIT-compiles CUDA at import (`functional/backend.py:6-27`) and
depends on addict/yapf/diffusers, none of which exist here. This loader
injects:

  * a pure-torch ``functional`` package (:mod:`torch_ref_functional`) with
    the CUDA kernels' semantics,
  * minimal addict / yapf / diffusers / tqdm stand-ins,

then imports ``grasp_ldm`` from the reference tree. The resulting modules
carry the EXACT state-dict key space of the published checkpoints, making
them golden oracles for the converter (`utils/torch_convert.py`).
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"
_FUNCTIONAL_NAME = "grasp_ldm.models.modules.ext.pvcnn.modules.functional"


class AttrDict(dict):
    """mmcv-ConfigDict-style dict: attribute access, KeyError on missing."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for k, v in dict(*args, **kwargs).items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, cls):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Returns the imported ``grasp_ldm`` package (cached)."""
    if "grasp_ldm" in sys.modules and hasattr(sys.modules["grasp_ldm"], "models"):
        return sys.modules["grasp_ldm"]

    # third-party stand-ins
    if "addict" not in sys.modules:
        _stub_module("addict", Dict=AttrDict)
    if "yapf" not in sys.modules:
        yapf = _stub_module("yapf")
        yapflib = _stub_module("yapf.yapflib")
        api = _stub_module(
            "yapf.yapflib.yapf_api",
            FormatCode=lambda text, style_config=None, verify=True: (text, True),
        )
        yapf.yapflib = yapflib
        yapflib.yapf_api = api
    if "diffusers" not in sys.modules:
        class _NoScheduler:
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "diffusers is stubbed; the oracle only exercises model "
                    "forwards, not the diffusers schedulers"
                )

        _stub_module(
            "diffusers", DDIMScheduler=_NoScheduler, DDPMScheduler=_NoScheduler
        )
    try:
        import tqdm  # noqa: F401
        import tqdm.auto  # noqa: F401
    except ImportError:
        auto = _stub_module("tqdm.auto", tqdm=lambda x, **k: x)
        t = _stub_module("tqdm", tqdm=lambda x, **k: x)
        t.auto = auto

    # the CUDA functional package, replaced with pure-torch semantics
    import torch_ref_functional as trf

    fmod = _stub_module(_FUNCTIONAL_NAME)
    for name in trf.__all__:
        setattr(fmod, name, getattr(trf, name))

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import grasp_ldm  # noqa: F401
    import grasp_ldm.models.grasp_vae  # noqa: F401
    import grasp_ldm.models.grasp_ldm  # noqa: F401

    return sys.modules["grasp_ldm"]
