"""Serving layer: dynamic batching + HTTP endpoint.

The reference has no serving surface; these tests pin the rebuild-side
contract: concurrent requests coalesce into bucket-shaped batches, every
caller gets exactly its own slice, errors propagate per request without
killing the worker, and the HTTP API round-trips the result schema.
"""

import json
import threading
import time
from http.client import HTTPConnection

import numpy as np
import pytest

from graspldm_tpu.serving import DynamicBatcher, GraspServer


def _fake_generate(record=None, fail=False, delay=0.0, num_grasps=8):
    """Batch fn whose outputs encode the input rows (routing check)."""

    def fn(pcs, cls):
        if record is not None:
            record.append((pcs.shape[0], None if cls is None else cls.copy()))
        if fail:
            raise RuntimeError("boom")
        if delay:
            time.sleep(delay)
        B = pcs.shape[0]
        G = num_grasps
        # confidence row i = mean of pc i -> provable per-request routing
        conf = np.repeat(pcs.mean(axis=(1, 2))[:, None], G, axis=1)
        return {
            "grasps": np.tile(np.eye(4), (B, G, 1, 1)),
            "grasp_tmrp": np.zeros((B, G, 6), np.float32),
            "confidence": conf,
        }

    return fn


def test_batcher_routes_concurrent_requests():
    record = []
    b = DynamicBatcher(
        _fake_generate(record), num_points=16, max_batch=8, max_wait_ms=50.0
    )
    try:
        futs = []
        for i in range(6):
            pc = np.full((40, 3), float(i + 1), np.float32)
            futs.append((i, b.submit(pc, num_grasps=4)))
        for i, fut in futs:
            res = fut.result(timeout=10)
            # mean of a constant cloud == the request's value
            assert res["confidence"].shape == (4,)
            np.testing.assert_allclose(res["confidence"], float(i + 1), rtol=1e-6)
            assert res["grasps"].shape == (4, 4, 4)
        # 6 requests coalesced into few batches, padded to a bucket size
        sizes = [s for s, _ in record]
        assert sum(min(s, 8) for s in sizes) >= 6
        assert all(s in (1, 2, 4, 8) for s in sizes)
        stats = b.stats()
        assert stats["requests"] == 6
        assert stats["batches"] == len(sizes)
        assert stats["latency_p50_ms"] is not None
    finally:
        b.close()


def test_batcher_single_request_uses_smallest_bucket():
    record = []
    b = DynamicBatcher(
        _fake_generate(record), num_points=16, max_batch=8, max_wait_ms=0.0
    )
    try:
        res = b.generate(np.ones((16, 3), np.float32), num_grasps=2, timeout=10)
        assert res["confidence"].shape == (2,)
        assert record[0][0] == 1
    finally:
        b.close()


def test_batcher_regularizes_point_count():
    seen = {}

    def fn(pcs, cls):
        seen["shape"] = pcs.shape
        return _fake_generate()(pcs, cls)

    b = DynamicBatcher(fn, num_points=32, max_batch=2, max_wait_ms=0.0)
    try:
        b.generate(np.random.rand(7, 3).astype(np.float32), 1, timeout=10)
        assert seen["shape"][1:] == (32, 3)  # padded up
        b.generate(np.random.rand(200, 3).astype(np.float32), 1, timeout=10)
        assert seen["shape"][1:] == (32, 3)  # subsampled down
    finally:
        b.close()


def test_batcher_error_propagates_and_worker_survives():
    calls = [0]

    def fn(pcs, cls):
        calls[0] += 1
        if calls[0] == 1:
            raise RuntimeError("boom")
        return _fake_generate()(pcs, cls)

    b = DynamicBatcher(fn, num_points=8, max_batch=2, max_wait_ms=0.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.generate(np.ones((8, 3), np.float32), 1, timeout=10)
        res = b.generate(np.ones((8, 3), np.float32), 1, timeout=10)
        assert res["confidence"].shape == (1,)
        assert b.stats()["errors"] == 1
    finally:
        b.close()


def test_batcher_rejects_bad_input():
    b = DynamicBatcher(_fake_generate(), num_points=8, max_batch=2)
    try:
        with pytest.raises(ValueError, match=r"\[N, 3\]"):
            b.submit(np.ones((4, 2), np.float32), 1)
        with pytest.raises(ValueError, match="non-finite"):
            b.submit(np.full((4, 3), np.nan, np.float32), 1)
    finally:
        b.close()


def test_batcher_cls_padding_and_passthrough():
    record = []
    b = DynamicBatcher(
        _fake_generate(record), num_points=8, max_batch=4, max_wait_ms=50.0
    )
    try:
        f1 = b.submit(np.ones((8, 3), np.float32), 1, cls_cond=1.0)
        f2 = b.submit(np.ones((8, 3), np.float32), 1, cls_cond=0.0)
        f1.result(timeout=10), f2.result(timeout=10)
        # cls array covers the padded bucket, real values first
        (size, cls), = record
        assert cls is not None and len(cls) == size
        assert cls[0] == 1.0 and cls[1] == 0.0
    finally:
        b.close()


def test_batcher_requires_cls_validated_at_submit():
    """cls-vs-model compatibility fails the request itself, immediately —
    not via whatever batch it happens to be coalesced into."""
    b = DynamicBatcher(
        _fake_generate(), num_points=8, max_batch=2, requires_cls=True
    )
    try:
        with pytest.raises(ValueError, match="needs 'cls'"):
            b.submit(np.ones((8, 3), np.float32), 1)
        # a valid request still goes through
        b.generate(np.ones((8, 3), np.float32), 1, cls_cond=1.0, timeout=10)
    finally:
        b.close()
    b = DynamicBatcher(
        _fake_generate(), num_points=8, max_batch=2, requires_cls=False
    )
    try:
        with pytest.raises(ValueError, match="not class-conditioned"):
            b.submit(np.ones((8, 3), np.float32), 1, cls_cond=1.0)
    finally:
        b.close()


def test_batcher_mixed_cls_batch_splits():
    """With requires_cls unknown, a cls-less request coalesced with a
    cls-bearing one must NOT be silently conditioned on class 0: the
    worker executes the two groups as separate batches."""
    record = []
    b = DynamicBatcher(
        _fake_generate(record), num_points=8, max_batch=4, max_wait_ms=100.0
    )
    try:
        f1 = b.submit(np.ones((8, 3), np.float32), 1, cls_cond=1.0)
        f2 = b.submit(np.ones((8, 3), np.float32), 1)  # no cls
        f1.result(timeout=10), f2.result(timeout=10)
        assert len(record) == 2
        clses = sorted(
            (None if c is None else float(c[0]) for _, c in record),
            key=lambda v: (v is not None, v),
        )
        assert clses[0] is None and clses[1] == 1.0
    finally:
        b.close()


def test_batcher_mixed_traffic_keeps_full_batches():
    """Steady interleaved cls/no-cls traffic must coalesce per GROUP at
    collection time (queue head picks the group), not collect a mixed
    batch and halve it at execution — 8 interleaved requests with
    max_batch=4 run as exactly two full uniform batches."""
    record = []
    b = DynamicBatcher(
        _fake_generate(record), num_points=8, max_batch=4, max_wait_ms=200.0
    )
    try:
        futs = []
        for i in range(8):
            cls = 1.0 if i % 2 == 0 else None
            futs.append(b.submit(np.ones((8, 3), np.float32), 1, cls_cond=cls))
        for f in futs:
            f.result(timeout=10)
        assert len(record) == 2, record
        assert sorted(s for s, _ in record) == [4, 4]
        # one batch carried cls for all rows, the other none
        cls_presence = sorted(c is not None for _, c in record)
        assert cls_presence == [False, True]
    finally:
        b.close()


def test_batcher_closed_submit_raises_runtimeerror():
    b = DynamicBatcher(_fake_generate(), num_points=8, max_batch=2)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.ones((8, 3), np.float32), 1)


# -- HTTP layer --


@pytest.fixture()
def http_server():
    b = DynamicBatcher(
        _fake_generate(num_grasps=8), num_points=16, max_batch=4,
        max_wait_ms=2.0,
    )
    srv = GraspServer(
        b, host="127.0.0.1", port=0, info={"num_grasps": 8, "mode": "LDM"}
    )
    srv.start_background()
    yield srv
    srv.shutdown()


def _post(addr, path, payload):
    conn = HTTPConnection(*addr, timeout=30)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(addr, path):
    conn = HTTPConnection(*addr, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def test_http_generate_roundtrip(http_server):
    addr = http_server.address
    pts = (np.ones((24, 3)) * 0.5).tolist()
    status, body = _post(addr, "/v1/generate",
                         {"points": pts, "num_grasps": 3})
    assert status == 200
    assert np.asarray(body["grasps"]).shape == (3, 4, 4)
    assert np.asarray(body["confidence"]).shape == (3,)
    np.testing.assert_allclose(body["confidence"], 0.5, rtol=1e-6)
    assert body["num_grasps"] == 3


def test_http_concurrent_requests_batch(http_server):
    addr = http_server.address
    results = {}

    def worker(i):
        pts = (np.ones((10, 3)) * (i + 1)).tolist()
        results[i] = _post(addr, "/v1/generate",
                           {"points": pts, "num_grasps": 2})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        status, body = results[i]
        assert status == 200
        np.testing.assert_allclose(body["confidence"], float(i + 1), rtol=1e-6)
    status, stats = _get(addr, "/v1/stats")
    assert status == 200
    assert stats["requests"] == 4


def test_http_health_and_errors(http_server):
    addr = http_server.address
    status, body = _get(addr, "/healthz")
    assert status == 200 and body["ok"] is True
    status, _ = _get(addr, "/nope")
    assert status == 404
    status, body = _post(addr, "/v1/generate", {"points": [[1, 2]]})
    assert status == 400 and "error" in body
    status, body = _post(addr, "/v1/generate",
                         {"points": [[0, 0, 0]], "num_grasps": 999})
    assert status == 400
    # cls on an unconditional server -> per-request 500, server stays up
    status, body = _post(addr, "/v1/generate",
                         {"points": [[0, 0, 0.1]], "cls": 1.0})
    assert status in (200, 500)
    status, _ = _get(addr, "/healthz")
    assert status == 200


def test_http_closed_batcher_returns_503():
    """A closed batcher is server state, not a caller error: 503."""
    b = DynamicBatcher(_fake_generate(), num_points=8, max_batch=2)
    srv = GraspServer(b, host="127.0.0.1", port=0, info={"num_grasps": 4})
    srv.start_background()
    try:
        b.close()
        status, body = _post(srv.address, "/v1/generate",
                             {"points": [[0, 0, 0]], "num_grasps": 1})
        assert status == 503 and "closed" in body["error"]
    finally:
        srv.shutdown()


# -- real tiny model end-to-end (CPU) --


def test_serving_real_model_smoke():
    import jax

    from graspldm_tpu.flagship import FlagshipConfig, build_flagship, jit_init
    from graspldm_tpu.serving import make_batch_generate_from_parts

    cfg = FlagshipConfig(
        pc_num_points=32,
        pc_latent_size=8,
        pc_latent_channels=3,
        grasp_latent_size=4,
        block_channels=(8, 16),
        resnet_block_groups=4,
        pc_scale_channels=0.25,
        pc_scale_voxel_resolution=0.25,
        diffusion_timesteps=8,
    )
    vae, ddm, diffusion = build_flagship(cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    pc = jnp.zeros((1, 32, 3))
    grasps = jnp.zeros((2, 7))
    vae_vars = jit_init(vae, {"params": rng, "dropout": rng}, pc, grasps)
    x = jnp.zeros((2, 1, 4))
    t = jnp.zeros((2,), jnp.int32)
    zc = jnp.zeros((2, 3, 8))
    ddm_vars = jit_init(ddm, {"params": rng, "dropout": rng}, x, t, zc)

    fn = make_batch_generate_from_parts(
        vae, vae_vars, ddm, ddm_vars, diffusion,
        num_grasps=4, num_inference_steps=4, sampler="ddim",
    )
    b = DynamicBatcher(fn, num_points=32, max_batch=2, max_wait_ms=20.0)
    try:
        f1 = b.submit(np.random.rand(50, 3).astype(np.float32) * 0.05, 4)
        f2 = b.submit(np.random.rand(20, 3).astype(np.float32) * 0.05, 2)
        # a COLD compile of the one-bucket generation program takes ~3.5 min
        # on this single-CPU host (the persistent compile cache in conftest
        # makes repeat runs fast) — budget well past it
        r1, r2 = f1.result(timeout=600), f2.result(timeout=600)
        assert r1["grasps"].shape == (4, 4, 4)
        assert r2["grasps"].shape == (2, 4, 4)
        assert np.isfinite(r1["grasps"]).all()
        assert (r1["confidence"] >= 0).all() and (r1["confidence"] <= 1).all()
        # bottom row of every homogeneous transform is [0, 0, 0, 1]
        np.testing.assert_allclose(
            r1["grasps"][:, 3], np.tile([0, 0, 0, 1], (4, 1)), atol=1e-6
        )
    finally:
        b.close()
