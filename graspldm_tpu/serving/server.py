"""HTTP grasp-generation service over the jitted TPU pipelines.

Stdlib-only (``http.server``): a ``ThreadingHTTPServer`` accepts JSON
requests, hands each object's point cloud to the :class:`DynamicBatcher`,
and returns world-frame grasp transforms. One compiled program per batch
bucket; the whole model stays resident on device.

API:
  * ``POST /v1/generate`` — body ``{"points": [[x, y, z], ...],
    "num_grasps": int, "cls": float?}`` -> ``{"grasps": [G, 4, 4],
    "grasp_tmrp": [G, 6], "confidence": [G], "qualities": [G, nq]?}``.
  * ``GET /healthz`` — liveness.
  * ``GET /v1/stats`` — batcher counters + latency percentiles.

The reference framework has no serving surface (SURVEY.md §1 stops at the
`generate_grasps.py` CLI); this is rebuild-side production infrastructure
on top of `inference.pipeline`.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np

from .batcher import DynamicBatcher

__all__ = [
    "make_batch_generate",
    "make_batch_generate_from_parts",
    "GraspServer",
]

MAX_REQUEST_POINTS = 200_000
MAX_BODY_BYTES = 32 * 1024 * 1024


def make_batch_generate_from_parts(
    vae,
    vae_variables,
    ddm=None,
    ddm_variables=None,
    diffusion=None,
    num_grasps: int = 64,
    num_inference_steps: int = 100,
    sampler: str = "ddim",
    conditioning: Optional[str] = None,
    seed: int = 0,
) -> Callable[[np.ndarray, Optional[np.ndarray]], Dict]:
    """Build the batcher's compute callable from model parts.

    LDM mode when ``ddm`` is given, VAE-prior mode otherwise. The returned
    function jits ONE program per point-cloud batch shape (the batcher's
    buckets); normalization (per-object centering) runs inside the program
    so the host hands over raw metric points.

    ``conditioning='class'`` wires the per-request ``cls`` scalars through
    to a class-conditioned denoiser. Region conditioning needs per-request
    region point sets and is not exposed over this API.
    """
    import jax
    import jax.numpy as jnp

    from ..inference.pipeline import ldm_generate, vae_generate
    from ..utils.normalization import normalize_pc_and_grasps

    if conditioning not in (None, "class"):
        raise ValueError(
            f"serving supports unconditional or class-conditioned models, "
            f"got conditioning={conditioning!r}"
        )
    if ddm is not None and diffusion is None:
        raise ValueError("LDM serving needs the diffusion process")

    def _generate(pc, key, cls):
        dummy = jnp.zeros((pc.shape[0], 1, 6), pc.dtype)
        pc_n, _, meta = normalize_pc_and_grasps(pc, dummy)
        if ddm is None:
            return vae_generate(
                vae, vae_variables, pc_n, num_grasps, key, meta=meta
            )
        cls_cond = (
            jnp.repeat(cls, num_grasps) if cls is not None else None
        )
        return ldm_generate(
            vae,
            vae_variables,
            ddm,
            ddm_variables,
            diffusion,
            pc_n,
            num_grasps,
            key,
            num_inference_steps=num_inference_steps,
            sampler=sampler,
            meta=meta,
            cls_cond=cls_cond,
        )

    jitted = jax.jit(_generate, static_argnames=())
    jitted_nocls = jax.jit(lambda pc, key: _generate(pc, key, None))
    lock = threading.Lock()  # worker thread is single, but guard warmup too
    counter = [0]
    base_key = jax.random.PRNGKey(seed)

    def batch_generate(pcs: np.ndarray, cls: Optional[np.ndarray]) -> Dict:
        if cls is not None and conditioning != "class":
            raise ValueError(
                "this checkpoint's denoiser is not class-conditioned; "
                "drop the 'cls' field"
            )
        if cls is None and conditioning == "class":
            raise ValueError("class-conditioned model: every request needs 'cls'")
        with lock:
            counter[0] += 1
            key = jax.random.fold_in(base_key, counter[0])
            if cls is None:
                out = jitted_nocls(jnp.asarray(pcs), key)
            else:
                out = jitted(jnp.asarray(pcs), key, jnp.asarray(cls))
        return {k: np.asarray(v) for k, v in out.items() if v is not None}

    return batch_generate


def make_batch_generate(
    infer,
    num_grasps: int = 64,
    seed: int = 0,
) -> Callable[[np.ndarray, Optional[np.ndarray]], Dict]:
    """Adapt a loaded :class:`inference.runner.InferenceBase` for serving."""
    ddm = getattr(infer, "ddm", None)
    ddm_variables = getattr(infer, "ddm_variables", None)
    if ddm_variables is None:
        ddm = None  # VAE-only experiment: no diffusion stage loaded
    return make_batch_generate_from_parts(
        infer.vae,
        infer.vae_variables,
        ddm=ddm,
        ddm_variables=ddm_variables,
        diffusion=getattr(infer, "diffusion", None),
        num_grasps=num_grasps,
        num_inference_steps=infer.num_inference_steps,
        sampler=infer.sampler,
        conditioning=infer.model_cfg.conditioning,
        seed=seed,
    )


class _Handler(BaseHTTPRequestHandler):
    server_version = "graspldm-tpu/1.0"
    batcher: DynamicBatcher = None  # type: ignore[assignment]
    info: Dict = {}
    request_timeout_s: float = 120.0

    # quiet by default; the CLI flips this on with --verbose
    log_enabled = False

    def log_message(self, fmt, *args):  # noqa: D102
        if self.log_enabled:
            super().log_message(fmt, *args)

    def _reply(self, code: int, payload: Dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path == "/healthz":
            self._reply(200, {"ok": True, **self.info})
        elif self.path == "/v1/stats":
            self._reply(200, self.batcher.stats())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/v1/generate":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length <= 0 or length > MAX_BODY_BYTES:
                raise ValueError(f"bad Content-Length {length}")
            req = json.loads(self.rfile.read(length))
            points = np.asarray(req["points"], np.float32)
            if points.ndim != 2 or points.shape[1] != 3:
                raise ValueError(f"points must be [N, 3], got {points.shape}")
            if not 1 <= points.shape[0] <= MAX_REQUEST_POINTS:
                raise ValueError(
                    f"points count must be in [1, {MAX_REQUEST_POINTS}]"
                )
            max_g = self.info.get("num_grasps", 64)
            num_grasps = int(req.get("num_grasps", max_g))
            if not 1 <= num_grasps <= max_g:
                raise ValueError(f"num_grasps must be in [1, {max_g}]")
            cls = req.get("cls")
            cls = float(cls) if cls is not None else None
        except Exception as e:  # malformed request
            self._reply(400, {"error": str(e)})
            return
        try:
            # submit() raises ValueError for caller errors (pc shape /
            # finiteness / cls-vs-model compatibility → 400) and
            # RuntimeError when the batcher is closed — a server-state
            # condition, not a caller error, hence 503
            fut = self.batcher.submit(points, num_grasps, cls_cond=cls)
        except ValueError as e:
            self._reply(400, {"error": str(e)})
            return
        except RuntimeError as e:
            self._reply(503, {"error": str(e)})
            return
        try:
            res = fut.result(timeout=self.request_timeout_s)
        except Exception as e:  # model/validation error surfaced per request
            self._reply(500, {"error": str(e)})
            return
        payload = {
            k: np.asarray(v, np.float64).tolist()
            for k, v in res.items()
            if k in ("grasps", "grasp_tmrp", "confidence", "qualities")
        }
        payload["num_grasps"] = num_grasps
        self._reply(200, payload)


class GraspServer:
    """Threaded HTTP server bound to a :class:`DynamicBatcher`."""

    def __init__(
        self,
        batcher: DynamicBatcher,
        host: str = "127.0.0.1",
        port: int = 8421,
        info: Optional[Dict] = None,
        verbose: bool = False,
        request_timeout_s: float = 120.0,
    ):
        handler = type(
            "BoundHandler",
            (_Handler,),
            {
                "batcher": batcher,
                "info": dict(info or {}),
                "log_enabled": verbose,
                "request_timeout_s": request_timeout_s,
            },
        )
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.batcher = batcher
        self._thread: Optional[threading.Thread] = None

    @property
    def address(self):
        return self.httpd.server_address

    def start_background(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="graspldm-http", daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.batcher.close()
