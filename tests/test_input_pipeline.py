"""Host input pipeline: worker-pool batch production + dataset worker
copies (the reference's DataLoader num_workers story,
`grasp_ldm/trainers/trainer.py:175-186`)."""

import time

import numpy as np
import pytest

from graspldm_tpu.parallel import BatchWorkerPool


def test_pool_yields_all_batches_single_worker_in_order():
    def make_iter(wid, n):
        assert (wid, n) == (0, 1)
        for i in range(7):
            yield {"i": i}

    with BatchWorkerPool(make_iter, num_workers=1) as pool:
        got = [b["i"] for b in pool]
    assert got == list(range(7))


def test_pool_multi_worker_yields_union():
    def make_iter(wid, n):
        for i in range(wid, 20, n):
            yield {"i": i}

    with BatchWorkerPool(make_iter, num_workers=4) as pool:
        got = sorted(b["i"] for b in pool)
    assert got == list(range(20))


def test_pool_overlaps_production_with_consumption():
    """While the consumer 'computes', workers keep assembling: total time
    ~= max(producer, consumer), not their sum."""
    def make_iter(wid, n):
        for i in range(8):
            time.sleep(0.02)  # 'assembly' cost
            yield {"i": i}

    t0 = time.perf_counter()
    with BatchWorkerPool(make_iter, num_workers=1, prefetch=4) as pool:
        for b in pool:
            time.sleep(0.02)  # 'device step'
    elapsed = time.perf_counter() - t0
    # serial would be ~0.32s; overlapped ~0.18s. Generous CI bound:
    assert elapsed < 0.29


def test_pool_propagates_worker_exception():
    def make_iter(wid, n):
        yield {"i": 0}
        raise RuntimeError("boom in worker")

    with pytest.raises(RuntimeError, match="boom in worker"):
        with BatchWorkerPool(make_iter, num_workers=1) as pool:
            for _ in pool:
                pass


def test_pool_close_stops_blocked_workers():
    def make_iter(wid, n):
        i = 0
        while True:  # infinite producer
            yield {"i": i}
            i += 1

    pool = BatchWorkerPool(make_iter, num_workers=2, prefetch=2)
    it = iter(pool)
    assert next(it)["i"] >= 0
    pool.close()  # must not hang
    for t in pool._threads:
        t.join(timeout=5.0)
        assert not t.is_alive()


def test_dataset_worker_copy_independent_rng(tmp_path):
    from graspldm_tpu.data import (
        AcronymShapenetPointclouds,
        make_synthetic_acronym,
    )

    root = make_synthetic_acronym(str(tmp_path / "acronym"))
    ds = AcronymShapenetPointclouds(
        data_root_dir=root, split="train", batch_num_points_per_pc=32,
        batch_num_grasps_per_pc=4, min_num_grasps=4,
    )
    a, b = ds.worker_copy(1), ds.worker_copy(2)
    assert a.objects is b.objects  # records shared
    assert a._mesh_cache is b._mesh_cache  # mesh cache shared
    # same item index, different workers -> different random sampling
    ia, ib = a[0], b[0]
    assert ia["pc"].shape == ib["pc"].shape
    assert not np.allclose(ia["pc"], ib["pc"])
    # same seed -> reproducible
    ia2 = ds.worker_copy(1)[0]
    np.testing.assert_array_equal(ia["pc"], ia2["pc"])


def test_shard_dataset_records(tmp_path):
    """Per-process record slicing (the DistributedSampler half of the
    multi-host story): strided, disjoint, exhaustive."""
    from graspldm_tpu.data import (
        AcronymShapenetPointclouds,
        make_synthetic_acronym,
    )
    from graspldm_tpu.parallel.distributed import shard_dataset_records

    root = make_synthetic_acronym(str(tmp_path / "acronym"))

    def build():
        return AcronymShapenetPointclouds(
            data_root_dir=root, split="train", batch_num_points_per_pc=32,
            batch_num_grasps_per_pc=4, min_num_grasps=4,
            num_repeat_dataset=1,
        )

    full = build()
    n_total = len(full.objects)
    assert n_total >= 2
    all_keys = [o.mesh_path for o in full.objects]
    shards = []
    for pid in range(2):
        ds = shard_dataset_records(build(), process_id=pid, num_processes=2)
        keys = [o.mesh_path for o in ds.objects]
        assert keys == all_keys[pid::2]  # exact strided slice
        shards.append(keys)
    # disjoint and exhaustive over the full record list
    assert not set(shards[0]) & set(shards[1])
    assert sorted(shards[0] + shards[1]) == sorted(all_keys)

    # single process: untouched
    ds = shard_dataset_records(build(), process_id=0, num_processes=1)
    assert len(ds.objects) == n_total

    # classifier wrapper shards through .base
    from graspldm_tpu.data import AcronymGraspPointsDataset

    clf = AcronymGraspPointsDataset(base=build())
    shard_dataset_records(clf, process_id=1, num_processes=2)
    assert len(clf.base.objects) == n_total - (n_total + 1) // 2

    with pytest.raises(ValueError):
        shard_dataset_records(build(), process_id=0,
                              num_processes=n_total + 1)


def test_stack_batches_chunks_and_drops_tail():
    """stack_batches groups K consecutive batches into [K, ...] arrays and
    drops an incomplete trailing chunk."""
    import numpy as np

    from graspldm_tpu.parallel import stack_batches

    batches = [
        {"pc": np.full((2, 4, 3), i, np.float32), "grasps": np.full((2, 3), i)}
        for i in range(7)
    ]
    chunks = list(stack_batches(iter(batches), 3))
    assert len(chunks) == 2  # 7 batches -> 2 full chunks, tail of 1 dropped
    for j, c in enumerate(chunks):
        assert c["pc"].shape == (3, 2, 4, 3)
        assert c["grasps"].shape == (3, 2, 3)
        np.testing.assert_array_equal(
            c["pc"][:, 0, 0, 0], np.arange(3 * j, 3 * j + 3)
        )
