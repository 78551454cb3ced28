"""Unit tests for point-cloud ops vs. pure-numpy references.

The numpy references implement the CUDA contracts documented in SURVEY.md §2.1
(ball-query pad-with-first semantics, voxelize scatter-mean, trilinear corner
handling, FPS start-at-0 iteration).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspldm_tpu import ops


# ---------------- numpy references ----------------


def np_fps(coords, m):
    B, N, _ = coords.shape
    out = np.zeros((B, m), np.int32)
    for b in range(B):
        dists = np.full((N,), np.inf)
        last = 0
        for j in range(1, m):
            d = np.sum((coords[b] - coords[b, last]) ** 2, axis=-1)
            dists = np.minimum(dists, d)
            last = int(np.argmax(dists))
            out[b, j] = last
    return out


def np_ball_query(centers, points, radius, u):
    B, M, _ = centers.shape
    N = points.shape[1]
    out = np.zeros((B, M, u), np.int32)
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((centers[b, j] - points[b, k]) ** 2)
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, j, :] = k
                    if cnt < u:
                        out[b, j, cnt] = k
                        cnt += 1
                    else:
                        break
    return out


def np_avg_voxelize(features, vox_coords, r):
    B, N, C = features.shape
    out = np.zeros((B, r * r * r, C), np.float32)
    cnt = np.zeros((B, r * r * r), np.int64)
    idx = (
        vox_coords[..., 0].astype(np.int64) * r * r
        + vox_coords[..., 1].astype(np.int64) * r
        + vox_coords[..., 2].astype(np.int64)
    )
    for b in range(B):
        for n in range(N):
            out[b, idx[b, n]] += features[b, n]
            cnt[b, idx[b, n]] += 1
    return out / np.maximum(cnt, 1)[..., None]


def np_trilinear_devox(vox, coords, r):
    B, N, _ = coords.shape
    C = vox.shape[-1]
    out = np.zeros((B, N, C), np.float32)
    for b in range(B):
        for n in range(N):
            x, y, z = coords[b, n]
            lo = np.floor([x, y, z]).astype(int)
            fr = np.array([x, y, z]) - lo
            for cx in (0, 1):
                for cy in (0, 1):
                    for cz in (0, 1):
                        w = (
                            (fr[0] if cx else 1 - fr[0])
                            * (fr[1] if cy else 1 - fr[1])
                            * (fr[2] if cz else 1 - fr[2])
                        )
                        ix = min(lo[0] + cx, r - 1)
                        iy = min(lo[1] + cy, r - 1)
                        iz = min(lo[2] + cz, r - 1)
                        out[b, n] += w * vox[b, ix * r * r + iy * r + iz]
    return out


# ---------------- tests ----------------


class TestFPS:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(0)
        coords = rng.normal(size=(2, 64, 3)).astype(np.float32)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 16))
        want = np_fps(coords, 16)
        np.testing.assert_array_equal(got, want)

    def test_first_index_zero_and_unique(self):
        rng = np.random.default_rng(1)
        coords = rng.normal(size=(3, 256, 3)).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(coords), 64))
        assert np.all(idx[:, 0] == 0)
        for b in range(3):
            assert len(set(idx[b].tolist())) == 64

    def test_gather(self):
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(2, 32, 5)).astype(np.float32)
        idx = np.array([[0, 5, 31], [7, 7, 1]], np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(feats), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], feats[b, idx[b]])


class TestBallQuery:
    def test_matches_reference_loop(self):
        rng = np.random.default_rng(3)
        points = rng.uniform(-1, 1, size=(2, 128, 3)).astype(np.float32)
        centers = points[:, ::4][:, :16]
        got = np.asarray(
            ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.3, 8)
        )
        want = np_ball_query(centers, points, 0.3, 8)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_is_zero(self):
        points = np.zeros((1, 16, 3), np.float32)
        centers = np.full((1, 2, 3), 100.0, np.float32)
        got = np.asarray(
            ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.1, 4)
        )
        np.testing.assert_array_equal(got, 0)

    def test_blocked_matches_dense(self):
        """M-blocked path (bounded peak memory) is bit-identical to dense,
        including an M not divisible by the block size."""
        rng = np.random.default_rng(11)
        points = rng.uniform(-1, 1, size=(2, 96, 3)).astype(np.float32)
        centers = rng.uniform(-1, 1, size=(2, 37, 3)).astype(np.float32)
        dense = np.asarray(
            ops.ball_query(jnp.asarray(centers), jnp.asarray(points), 0.4, 6)
        )
        for block in (1, 8, 16, 37, 64):
            blocked = np.asarray(
                ops.ball_query(
                    jnp.asarray(centers), jnp.asarray(points), 0.4, 6,
                    block_size=block,
                )
            )
            np.testing.assert_array_equal(blocked, dense)
        np.testing.assert_array_equal(
            dense, np_ball_query(centers, points, 0.4, 6)
        )

    def test_auto_block_threshold(self, monkeypatch):
        """Above the element threshold, the auto path engages blocking and
        still matches the dense result."""
        from graspldm_tpu.ops import neighborhood as nb

        rng = np.random.default_rng(12)
        points = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
        centers = rng.uniform(-1, 1, size=(1, 50, 3)).astype(np.float32)
        dense = np.asarray(
            nb._ball_query_block(
                jnp.asarray(centers), jnp.asarray(points), 0.5, 4
            )
        )
        monkeypatch.setattr(nb, "_BALL_QUERY_BLOCK_THRESHOLD", 64 * 3 * 16)
        auto = np.asarray(
            nb.ball_query.__wrapped__(  # bypass jit cache keyed on globals
                jnp.asarray(centers), jnp.asarray(points), 0.5, 4, None
            )
        )
        np.testing.assert_array_equal(auto, dense)

    def test_grouping(self):
        rng = np.random.default_rng(4)
        feats = rng.normal(size=(2, 64, 7)).astype(np.float32)
        idx = rng.integers(0, 64, size=(2, 8, 4)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(feats), jnp.asarray(idx)))
        assert got.shape == (2, 8, 4, 7)
        for b in range(2):
            for m in range(8):
                np.testing.assert_array_equal(got[b, m], feats[b, idx[b, m]])


class TestVoxelize:
    def test_matches_reference_scatter_mean(self):
        rng = np.random.default_rng(5)
        r = 8
        feats = rng.normal(size=(2, 100, 6)).astype(np.float32)
        vox = rng.integers(0, r, size=(2, 100, 3)).astype(np.int32)
        got = np.asarray(ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox), r))
        want = np_avg_voxelize(feats, vox, r)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_matmul_and_scatter_paths_agree(self):
        rng = np.random.default_rng(6)
        r = 6
        feats = rng.normal(size=(2, 50, 4)).astype(np.float32)
        vox = rng.integers(0, r, size=(2, 50, 3)).astype(np.int32)
        a = np.asarray(
            ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox), r, method="matmul")
        )
        b = np.asarray(
            ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox), r, method="scatter")
        )
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_coord_normalization(self):
        rng = np.random.default_rng(7)
        coords = rng.uniform(-0.9, 0.9, size=(2, 64, 3)).astype(np.float32)
        out = np.asarray(
            ops.normalize_coords_for_voxelization(jnp.asarray(coords), 8, normalize=False)
        )
        assert out.min() >= 0.0 and out.max() <= 7.0
        out_n = np.asarray(
            ops.normalize_coords_for_voxelization(jnp.asarray(coords), 8, normalize=True)
        )
        assert out_n.min() >= 0.0 and out_n.max() <= 7.0

    def test_gradients(self):
        rng = np.random.default_rng(8)
        r = 4
        feats = jnp.asarray(rng.normal(size=(1, 20, 3)).astype(np.float32))
        vox = jnp.asarray(rng.integers(0, r, size=(1, 20, 3)).astype(np.int32))

        def loss(f):
            return jnp.sum(ops.avg_voxelize(f, vox, r) ** 2)

        g = jax.grad(loss)(feats)
        assert np.all(np.isfinite(np.asarray(g)))


class TestDevoxelize:
    def test_matches_reference(self):
        rng = np.random.default_rng(9)
        r = 6
        vox = rng.normal(size=(2, r * r * r, 5)).astype(np.float32)
        coords = rng.uniform(0, r - 1, size=(2, 40, 3)).astype(np.float32)
        got = np.asarray(
            ops.trilinear_devoxelize(jnp.asarray(vox), jnp.asarray(coords), r)
        )
        want = np_trilinear_devox(vox, coords, r)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_integer_coords_exact_gather(self):
        rng = np.random.default_rng(10)
        r = 4
        vox = rng.normal(size=(1, r * r * r, 2)).astype(np.float32)
        coords = np.array([[[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]]], np.float32)
        got = np.asarray(
            ops.trilinear_devoxelize(jnp.asarray(vox), jnp.asarray(coords), r)
        )
        np.testing.assert_allclose(got[0, 0], vox[0, 1 * 16 + 2 * 4 + 3], atol=1e-6)
        np.testing.assert_allclose(got[0, 1], vox[0, 0], atol=1e-6)

    def test_voxelize_devoxelize_roundtrip_at_centers(self):
        # A single point per voxel: devoxelize at the exact voxel coord
        # must return the original feature.
        r = 5
        B, N, C = 1, 10, 3
        rng = np.random.default_rng(11)
        feats = rng.normal(size=(B, N, C)).astype(np.float32)
        # unique voxel ids
        ids = rng.choice(r * r * r, size=N, replace=False)
        vox_coords = np.stack([ids // (r * r), (ids // r) % r, ids % r], -1).astype(
            np.float32
        )[None]
        grid = ops.avg_voxelize(jnp.asarray(feats), jnp.asarray(vox_coords), r)
        back = np.asarray(
            ops.trilinear_devoxelize(grid, jnp.asarray(vox_coords), r)
        )
        np.testing.assert_allclose(back[0], feats[0], atol=1e-5)


class TestThreeNN:
    def test_weights_sum_to_one_and_nearest(self):
        rng = np.random.default_rng(12)
        centers = rng.normal(size=(2, 32, 3)).astype(np.float32)
        cfeat = rng.normal(size=(2, 32, 4)).astype(np.float32)
        points = centers[:, :8] + 1e-6  # essentially on top of centers
        out = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(points), jnp.asarray(centers), jnp.asarray(cfeat)
            )
        )
        np.testing.assert_allclose(out, cfeat[:, :8], atol=1e-3)

    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(13)
        centers = rng.normal(size=(1, 16, 3)).astype(np.float32)
        cfeat = rng.normal(size=(1, 16, 2)).astype(np.float32)
        points = rng.normal(size=(1, 24, 3)).astype(np.float32)
        got = np.asarray(
            ops.three_nn_interpolate(
                jnp.asarray(points), jnp.asarray(centers), jnp.asarray(cfeat)
            )
        )
        # numpy reference
        want = np.zeros((1, 24, 2), np.float32)
        for n in range(24):
            d = np.sum((centers[0] - points[0, n]) ** 2, axis=-1)
            k3 = np.argsort(d)[:3]
            dd = np.clip(d[k3], 1e-10, 1e10)
            w = np.array([dd[1] * dd[2], dd[0] * dd[2], dd[0] * dd[1]])
            w = w / w.sum()
            want[0, n] = (cfeat[0, k3] * w[:, None]).sum(0)
        np.testing.assert_allclose(got, want, atol=1e-4)
