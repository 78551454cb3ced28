"""ACRONYM grasp dataset: h5 loading, full-pc sampling, batching.

Rebuild of `grasp_ldm/dataset/acronym/acronym.py:19-513` and
`acronym_pointclouds.py:13-425` as a host-side numpy pipeline feeding
fixed-shape device batches:

  * grasp h5 schema: ``grasps/transforms [G,4,4]``,
    ``grasps/qualities/flex/*`` (incl. ``object_in_gripper`` success flag),
    ``object/scale``; mesh path derived from the h5 filename
    ``{Category}_{shapenet_id}_{scale}.h5 -> meshes/{Category}/{id}.obj``
    (`acronym.py:259-271`).
  * grasps split good/bad by ``object_in_gripper``; qualities are negated
    (lower-is-better in raw ACRONYM) and min-max normalized per object
    (`acronym.py:372-380`); objects with too few good grasps are dropped
    (`acronym.py:368-370`).
  * per item: sample N surface points, pick G grasps (optionally mixing a
    ratio of failed grasps labeled 0), augment, center on the pc mean and
    apply the fixed normalization (`acronym_pointclouds.py:230-376`).

Everything is preloaded to RAM (the reference does the same) and every
batch has static shapes [B, N, 3] / [B, G, 7(+nq)] so the device program
never recompiles.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import h5py
import numpy as np
from scipy.spatial.transform import Rotation

from ..config import DATASETS
from ..utils.normalization import (
    ROTATION_SCALE_FACTOR,
    TRANSLATION_SCALE_FACTOR,
)
from .augmentations import AugmentationPipeline, build_augmentations
from .mesh import Mesh, load_obj

__all__ = [
    "load_data_splits",
    "ObjectGrasps",
    "AcronymShapenetPointclouds",
    "minmax_normalize",
    "compute_pc_regions",
]


def compute_pc_regions(
    pc: np.ndarray, num_regions: int, num_points_per_region: int,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Partition a point cloud into spatial regions for region conditioning.

    FPS picks ``num_regions`` well-spread seeds, every point is assigned to
    its nearest seed, and each region is resampled (with replacement) to a
    fixed ``num_points_per_region`` so shapes stay static for XLA. Returns
    ``(region_points [R, P, 3], seeds [R, 3])``. This supplies the
    ``region_points`` metas the reference's region-conditioned inference
    consumes (`tools/inference.py:366-398`) but whose dataset-side producer
    is not shipped upstream.
    """
    from ..utils.pointcloud_helpers import farthest_point_sample_np

    seed_idx = farthest_point_sample_np(pc, num_regions)
    seeds = pc[seed_idx]  # [R, 3]
    d = np.linalg.norm(pc[:, None, :] - seeds[None, :, :], axis=-1)  # [N, R]
    assign = d.argmin(axis=1)
    out = np.empty((num_regions, num_points_per_region, 3), pc.dtype)
    for r in range(num_regions):
        members = np.flatnonzero(assign == r)
        if members.size == 0:  # degenerate cloud: fall back to the seed
            members = np.asarray([seed_idx[r]])
        pick = rng.choice(members, size=num_points_per_region, replace=True)
        out[r] = pc[pick]
    return out, seeds


def minmax_normalize(
    x: np.ndarray, axis: int = 0, v_min: float = 0.0, v_max: float = 1.0
) -> np.ndarray:
    """Per-column min-max to [v_min, v_max] (`utils/torch_utils.py:40-58`)."""
    lo = x.min(axis=axis, keepdims=True)
    hi = x.max(axis=axis, keepdims=True)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    return (x - lo) / span * (v_max - v_min) + v_min


def load_data_splits(root_dir: str) -> Dict[str, Dict[str, List[str]]]:
    """``{root}/splits/{Category}.json`` -> {category: {train: [...], test: [...]}}."""
    split_dict: Dict[str, Dict[str, List[str]]] = {}
    for split_p in glob.glob(os.path.join(root_dir, "splits/*.json")):
        category = os.path.basename(split_p).rsplit(".json", 1)[0]
        with open(split_p) as f:
            splits = json.load(f)
        split_dict[category] = {
            k: [p.replace(".json", ".h5") for p in v] for k, v in splits.items()
        }
    return split_dict


def mesh_path_for_grasp_file(root_dir: str, grasp_filename: str) -> str:
    base = os.path.basename(grasp_filename)
    cat, shapenet_id = base.split("_")[0], base.split("_")[1]
    return os.path.join(root_dir, "meshes", cat, shapenet_id + ".obj")


@dataclasses.dataclass
class ObjectGrasps:
    """Preloaded per-object annotations (tmrp layout [t(3), mrp(3)])."""

    grasps: np.ndarray  # [Gg, 6] successful
    grasp_qualities: np.ndarray  # [Gg, nq]
    bad_grasps: np.ndarray  # [Gb, 6]
    bad_grasp_qualities: np.ndarray  # [Gb, nq]
    mesh_path: str
    mesh_category: str
    obj_scale: float
    quality_order: Tuple[str, ...]


def _H_to_tmrp_np(H: np.ndarray) -> np.ndarray:
    if H.shape[0] == 0:
        return np.zeros((0, 6), np.float32)
    mrp = Rotation.from_matrix(H[:, :3, :3]).as_mrp()
    return np.concatenate([H[:, :3, 3], mrp], axis=-1).astype(np.float32)


def load_object_grasps(
    grasp_fp: str, mesh_fp: str, min_num_grasps: int = 10
) -> Optional[ObjectGrasps]:
    """Load one grasp h5 file; None if below the min-grasp threshold."""
    with h5py.File(grasp_fp, "r") as data:
        obj_scale = float(np.asarray(data["object/scale"]))
        transforms = np.asarray(data["grasps/transforms"], dtype=np.float64)
        qualities_grp = data["grasps/qualities/flex"]
        success = np.asarray(qualities_grp["object_in_gripper"])
        q_keys = sorted(k for k in qualities_grp.keys() if k != "object_in_gripper")
        quals = (
            np.stack([np.asarray(qualities_grp[k]) for k in q_keys], axis=-1)
            if q_keys
            else np.zeros((len(success), 0))
        )

    good = success > 0
    if good.sum() <= min_num_grasps:
        return None
    good_q = minmax_normalize(-quals[good]) if quals.shape[-1] else quals[good]
    bad_q = minmax_normalize(-quals[~good]) if quals.shape[-1] else quals[~good]
    return ObjectGrasps(
        grasps=_H_to_tmrp_np(transforms[good]),
        grasp_qualities=good_q.astype(np.float32),
        bad_grasps=_H_to_tmrp_np(transforms[~good]),
        bad_grasp_qualities=bad_q.astype(np.float32),
        mesh_path=mesh_fp,
        mesh_category=os.path.basename(os.path.dirname(mesh_fp)),
        obj_scale=obj_scale,
        quality_order=tuple(q_keys),
    )


@DATASETS.register
class AcronymShapenetPointclouds:
    """Full point-cloud training dataset (mesh surface samples).

    Produces per-item dicts:
      ``pc [N, 3]`` normalized; ``grasps [G, 7(+nq)]`` rows
      ``[tmrp(6), success(1), qualities…]`` normalized;
      ``metas`` with pc/grasp mean+std for unnormalization.
    """

    def __init__(
        self,
        data_root_dir: str,
        split: str = "train",
        filter_categories: Optional[Sequence[str]] = None,
        rotation_repr: str = "mrp",
        augs_config: Optional[List[dict]] = None,
        batch_num_points_per_pc: int = 1024,
        batch_num_grasps_per_pc: int = 20,
        batch_failed_grasps_ratio: float = 0.3,
        load_fixed_subset_grasps_per_obj: Optional[int] = None,
        use_dataset_statistics_for_norm: bool = False,
        num_repeat_dataset: int = 2,
        min_num_grasps: int = 10,
        seed: int = 0,
        return_region_metas: bool = False,
        num_regions: int = 4,
        region_num_points: int = 128,
    ):
        assert rotation_repr == "mrp", "tmrp is the supported representation"
        self.root_dir = data_root_dir
        self.split = split
        self.num_points = batch_num_points_per_pc
        self.num_grasps = batch_num_grasps_per_pc
        self.failed_ratio = batch_failed_grasps_ratio
        self.num_repeat = num_repeat_dataset
        self.fixed_subset = load_fixed_subset_grasps_per_obj
        self.augmentations: AugmentationPipeline = build_augmentations(augs_config)
        self.return_region_metas = return_region_metas
        self.num_regions = num_regions
        self.region_num_points = region_num_points
        self._rng = np.random.default_rng(seed)
        self._mesh_cache: Dict[str, Mesh] = {}

        splits = load_data_splits(data_root_dir)
        if filter_categories is not None:
            keep = set(filter_categories)
            splits = {c: s for c, s in splits.items() if c in keep}

        self.objects: List[ObjectGrasps] = []
        for cat, cat_splits in sorted(splits.items()):
            for fname in cat_splits.get(split, []):
                grasp_fp = os.path.join(data_root_dir, "grasps", fname)
                mesh_fp = mesh_path_for_grasp_file(data_root_dir, fname)
                if not (os.path.exists(grasp_fp) and os.path.exists(mesh_fp)):
                    continue
                rec = load_object_grasps(grasp_fp, mesh_fp, min_num_grasps)
                if rec is not None:
                    self.objects.append(rec)
        if not self.objects:
            raise FileNotFoundError(
                f"No usable ACRONYM objects under {data_root_dir} (split={split})"
            )

        # normalization params: fixed scales by default; optionally derived
        # from dataset statistics (`acronym_pointclouds.py:346-425`)
        self._pc_scale = np.full((3,), TRANSLATION_SCALE_FACTOR, np.float32)
        self._grasp_scale = np.array(
            [TRANSLATION_SCALE_FACTOR] * 3 + [ROTATION_SCALE_FACTOR] * 3,
            np.float32,
        )
        if use_dataset_statistics_for_norm:
            (_, pc_std), (_, grasp_std) = self.get_dataset_statistics()
            self._pc_scale = pc_std.astype(np.float32)
            self._grasp_scale = grasp_std.astype(np.float32)

    def get_dataset_statistics(self, max_objects: int = 64):
        """Per-dimension std of centered pcs and grasps across objects.

        Mirrors `acronym_pointclouds.py:378-425` (mean is ~0 after the
        per-object centering, so only std matters for the scale).
        """
        rng = np.random.default_rng(0)
        pcs, grasps = [], []
        for rec in self.objects[:max_objects]:
            mesh = self._get_mesh(rec)
            pc = mesh.sample(self.num_points, rng)
            pc_mean = pc.mean(0)
            pcs.append(pc - pc_mean)
            g = rec.grasps.copy()
            g[:, :3] -= pc_mean
            grasps.append(g)
        pc_all = np.concatenate(pcs, 0)
        g_all = np.concatenate(grasps, 0)
        return (
            (pc_all.mean(0), pc_all.std(0)),
            (g_all.mean(0), g_all.std(0)),
        )

    def __len__(self) -> int:
        return len(self.objects) * self.num_repeat

    @property
    def num_qualities(self) -> int:
        return self.objects[0].grasp_qualities.shape[-1]

    def _get_mesh(self, rec: ObjectGrasps) -> Mesh:
        key = rec.mesh_path
        if key not in self._mesh_cache:
            self._mesh_cache[key] = load_obj(rec.mesh_path).scaled(rec.obj_scale)
        return self._mesh_cache[key]

    def _select_grasps(
        self, rec: ObjectGrasps, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pick G grasps mixing good/bad; returns (tmrp [G,6], success [G], quals)."""
        g_total = self.num_grasps
        n_bad = int(round(g_total * self.failed_ratio))
        n_bad = min(n_bad, len(rec.bad_grasps))
        n_good = g_total - n_bad

        gi = rng.choice(len(rec.grasps), size=n_good, replace=len(rec.grasps) < n_good)
        tmrp = rec.grasps[gi]
        quals = rec.grasp_qualities[gi]
        success = np.ones((n_good,), np.float32)
        if n_bad > 0:
            bi = rng.choice(
                len(rec.bad_grasps), size=n_bad, replace=len(rec.bad_grasps) < n_bad
            )
            tmrp = np.concatenate([tmrp, rec.bad_grasps[bi]], 0)
            quals = np.concatenate([quals, rec.bad_grasp_qualities[bi]], 0)
            success = np.concatenate([success, np.zeros((n_bad,), np.float32)])
        perm = rng.permutation(g_total)
        return tmrp[perm], success[perm], quals[perm]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rec = self.objects[index % len(self.objects)]
        rng = self._rng
        mesh = self._get_mesh(rec)
        pc = mesh.sample(self.num_points, rng)  # [N, 3]
        tmrp, success, quals = self._select_grasps(rec, rng)

        # augment (pc [1, N, 3] convention for pipeline)
        pc, tmrp = self.augmentations(pc, tmrp, rng)

        # center on pc mean
        pc_mean = pc.mean(axis=0)
        pc = pc - pc_mean
        tmrp = tmrp.copy()
        tmrp[:, :3] -= pc_mean

        # scale normalization (fixed factors or dataset statistics)
        pc = pc / self._pc_scale
        tmrp = tmrp / self._grasp_scale

        grasps = np.concatenate([tmrp, success[:, None]], axis=-1)
        if quals.shape[-1]:
            grasps = np.concatenate([grasps, quals], axis=-1)

        grasp_mean = np.concatenate([pc_mean, np.zeros(3)]).astype(np.float32)
        metas = {
            "pc_mean": pc_mean.astype(np.float32),
            "pc_std": self._pc_scale,
            "grasp_mean": grasp_mean,
            "grasp_std": self._grasp_scale,
        }
        if self.return_region_metas:
            # regions + per-grasp nearest-region labels, normalized frame
            # (consumed by the region-conditioned denoiser,
            # reference `tools/inference.py:366-398`)
            region_pts, seeds = compute_pc_regions(
                pc.astype(np.float32), self.num_regions,
                self.region_num_points, rng,
            )
            d = np.linalg.norm(
                tmrp[:, None, :3] - seeds[None, :, :], axis=-1
            )
            metas["region_points"] = region_pts
            metas["grasp_region_labels"] = d.argmin(axis=1).astype(np.int32)
        return {
            "pc": pc.astype(np.float32),
            "grasps": grasps.astype(np.float32),
            "metas": metas,
        }

    def worker_copy(self, seed: int) -> "AcronymShapenetPointclouds":
        """Shallow copy with an independent RNG, for one loader-worker
        thread (`parallel/workers.py`). Object records and the mesh cache
        are shared; the per-worker RNG removes the only cross-thread
        mutable state on the item path."""
        import copy

        c = copy.copy(self)
        c._rng = np.random.default_rng(seed)
        return c

    def batches(
        self, batch_size: int, *, shuffle: bool = True, drop_last: bool = True
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked numpy batches {pc [B,N,3], grasps [B,G,D], metas}."""
        order = np.arange(len(self))
        if shuffle:
            self._rng.shuffle(order)
        for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                           batch_size):
            idxs = order[start : start + batch_size]
            if drop_last and len(idxs) < batch_size:
                break
            items = [self[int(i)] for i in idxs]
            yield {
                "pc": np.stack([it["pc"] for it in items]),
                "grasps": np.stack([it["grasps"] for it in items]),
                "metas": {
                    k: np.stack([it["metas"][k] for it in items])
                    for k in items[0]["metas"]
                },
            }
