"""KITTI dataset: sample index, per-frame loading, batching.

Capability parity with ``avod/datasets/kitti/kitti_dataset.py`` +
``kitti_utils.py``: a split-file-driven sample index whose ``load_sample``
produces everything one training step needs. The heavy per-frame work the
reference did on the host (BEV maps, sparse matrices, anchor info) is NOT
done here — it moved on-device (``ops.bev_device``, ``ops.sparse_build``,
``ops.anchors``); the host only reads files, rescales the image onto the
fixed canvas, applies augmentation, and pads to static shapes.
"""

from __future__ import annotations

import dataclasses
import os
import zlib
from typing import Iterator, List, Optional

import numpy as np

from sparse_pooling_tpu.configs.config import (
    AreaExtents,
    DatasetConfig,
    ModelConfig,
)
from sparse_pooling_tpu.data import augmentation as aug
from sparse_pooling_tpu.data import calib as calib_mod
from sparse_pooling_tpu.data import labels as labels_mod
from sparse_pooling_tpu.data import pointcloud

MAX_GT_BOXES = 32


@dataclasses.dataclass
class HostSample:
    """Numpy twin of ``models.pipeline.RawSample`` plus metadata."""

    sample_id: str
    points: np.ndarray  # [P, 3] f32
    points_mask: np.ndarray  # [P] bool
    image: np.ndarray  # [Hi, Wi, 3] uint8
    p2: np.ndarray  # [3, 4] f32 canvas-scaled
    ground_plane: np.ndarray  # [4] f32
    gt_boxes_3d: np.ndarray  # [G, 7] f32
    gt_valid: np.ndarray  # [G] bool
    gt_classes: np.ndarray  # [G] int32
    # [2] f32 (sy, sx) canvas/raw for the in-graph resize; (1, 1) when the
    # image field is already canvas-resized (host-resize path)
    image_scale: np.ndarray = None
    raw_image_hw: tuple = (0, 0)

    NUM_ARRAYS = 9

    def as_arrays(self) -> tuple:
        """Field order matches RawSample."""

        return (
            self.points, self.points_mask, self.image, self.p2,
            self.ground_plane, self.gt_boxes_3d, self.gt_valid,
            self.gt_classes, self.image_scale,
        )


class KittiDataset:
    """Sample index over a KITTI object tree (reference KittiDataset)."""

    def __init__(
        self,
        cfg: DatasetConfig,
        model_cfg: ModelConfig,
        extents: AreaExtents = AreaExtents(),
    ):
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.extents = extents
        self.base = os.path.join(cfg.root, cfg.data_dir)
        split_path = os.path.join(cfg.root, cfg.split + ".txt")
        with open(split_path) as f:
            self.sample_ids: List[str] = [l.strip() for l in f if l.strip()]
        self.class_to_idx = {
            name: i + 1 for i, name in enumerate(model_cfg.classes)
        }

    def __len__(self) -> int:
        return len(self.sample_ids)

    # ------------------------------------------------------------ paths
    def _path(self, folder: str, sid: str, ext: str) -> str:
        return os.path.join(self.base, folder, sid + ext)

    # ------------------------------------------------------------ loading
    def load_sample(
        self,
        sid: str,
        augment_seed: Optional[int] = None,
        image_out: Optional[np.ndarray] = None,
    ) -> HostSample:
        """Load + canvas-scale + (optionally) augment + pad one frame.

        ``augment_seed`` enables deterministic flip/PCA selection; None
        disables augmentation (eval path).

        ``image_out``: optional ZERO-FILLED [H, W, 3] u8 canvas the image is
        placed into in place (typically a row of a preallocated batch array,
        so batch assembly never copies image bytes — the eval sweep's
        dominant host cost). The returned ``HostSample.image`` is then that
        array.
        """

        from PIL import Image

        from sparse_pooling_tpu.native import sample_loader as native_loader

        mc = self.model_cfg
        cal = calib_mod.read_calibration(self._path("calib", sid, ".txt"))
        # native decode writes RGB rows straight into the zeroed canvas and
        # releases the GIL (C call), so the eval loader threads genuinely
        # overlap the consumer on a 1-core host; PIL twin as fallback
        img_path = self._path("image_2", sid, ".png")
        canvas = None
        img = None
        # decode-once cache (round-3 verdict item 6): a repeated checkpoint
        # sweep re-decodes the same val PNGs once PER CHECKPOINT (~3.5
        # ms/frame of the 14.4 ms/frame host budget on the 1-core sweep
        # host); with dataset.image_cache_dir set, the decoded raw image is
        # persisted as .npy on first touch and mmap-copied afterwards
        # (~0.3 ms/frame).
        cache_path = None
        if self.cfg.image_cache_dir:
            cache_path = os.path.join(self.cfg.image_cache_dir, sid + ".npy")
            if os.path.exists(cache_path):
                cached = np.load(cache_path, mmap_mode="r")
                raw_hw = cached.shape[:2]
                if (
                    image_out is not None
                    and mc.image.device_resize
                    and raw_hw[0] <= mc.image.height
                    and raw_hw[1] <= mc.image.width
                ):
                    image_out[: raw_hw[0], : raw_hw[1]] = cached
                    canvas = image_out
                    img = canvas[: raw_hw[0], : raw_hw[1]]
                else:
                    img = np.array(cached)
                cache_path = None  # hit: nothing to write back
        if img is None and mc.image.device_resize and native_loader.available():
            res = native_loader.decode_png_canvas(
                img_path, mc.image.height, mc.image.width, out=image_out
            )
            if res is not None:
                canvas, raw_hw = res
                img = canvas[: raw_hw[0], : raw_hw[1]]
        if img is None:
            # .convert("RGB") on an already-RGB image is a 3.6 ms copy
            img_pil = Image.open(img_path)
            if img_pil.mode != "RGB":
                img_pil = img_pil.convert("RGB")
            img = np.asarray(img_pil)
            raw_hw = img.shape[:2]
        if cache_path is not None:
            # write-once, atomic (loader threads race on the same frame)
            os.makedirs(self.cfg.image_cache_dir, exist_ok=True)
            tmp = cache_path + f".tmp{os.getpid()}.npy"
            with open(tmp, "wb") as f:
                np.save(f, np.ascontiguousarray(img))
            os.replace(tmp, cache_path)
        pts = None
        if native_loader.available():
            pts = native_loader.load_points(
                self._path("velodyne", sid, ".bin"), cal.velo_to_rect(),
                cal.p2, raw_hw, self.extents,
            )
        if pts is None:
            pts = pointcloud.load_points_filtered(
                self._path("velodyne", sid, ".bin"), cal, raw_hw, self.extents
            )
        plane_path = self._path("planes", sid, ".txt")
        if os.path.exists(plane_path):
            plane = labels_mod.read_ground_plane(plane_path)
        else:
            plane = labels_mod.default_ground_plane()
        gt = labels_mod.filter_labels_by_class(
            labels_mod.read_labels(self._path("label_2", sid, ".txt")),
            mc.classes,
        )

        if augment_seed is not None:
            rng = np.random.RandomState(augment_seed)
            dirty = False
            if self.cfg.aug_flip and rng.rand() < 0.5:
                img, pts, cal, gt = aug.flip_sample(img, pts, cal, gt)
                # the fused loader filtered extents pre-flip; asymmetric
                # extents (or the half-open x bound) can differ post-flip
                pts = pointcloud.filter_to_area_extents(pts, self.extents)
                dirty = True
            if self.cfg.aug_pca_jitter:
                img = aug.pca_jitter(img, rng)
                dirty = True
            if canvas is not None and dirty:
                # img is a fresh augmented array; re-place it in the canvas
                canvas[: raw_hw[0], : raw_hw[1]] = img

        # image -> fixed canvas (P2 scales with the canvas/raw ratio either
        # way). device_resize: memcpy the raw content top-left and let the
        # graph resample it (ops.image_resize) — the host PIL resize was
        # 18.6 ms/frame, the largest eval-loader item on a 1-core VM.
        sy = mc.image.height / raw_hw[0]
        sx = mc.image.width / raw_hw[1]
        if (
            mc.image.device_resize
            and raw_hw[0] <= mc.image.height
            and raw_hw[1] <= mc.image.width
        ):
            if canvas is not None:
                img_canvas = canvas  # native decode already placed the raw
            else:
                if image_out is not None:
                    # the native decode may have failed after a partial
                    # write; restore the zero-fill contract before placing
                    image_out[:] = 0
                    img_canvas = image_out
                else:
                    img_canvas = np.zeros(
                        (mc.image.height, mc.image.width, 3), np.uint8
                    )
                img_canvas[: raw_hw[0], : raw_hw[1]] = img
            image_scale = np.array([sy, sx], np.float32)
        else:
            resized = np.asarray(
                Image.fromarray(img).resize(
                    (mc.image.width, mc.image.height), Image.BILINEAR
                )
            )
            if image_out is not None:
                image_out[:] = resized
                img_canvas = image_out
            else:
                img_canvas = resized
            image_scale = np.ones((2,), np.float32)
        p2 = cal.p2.astype(np.float32).copy()
        p2[0] *= sx
        p2[1] *= sy

        padded, mask = pointcloud.pad_or_subsample(
            pts.astype(np.float32), mc.sparse_pool.max_points,
            seed=int(sid) if sid.isdigit() else 0,
        )

        gt_boxes = np.zeros((MAX_GT_BOXES, 7), np.float32)
        gt_valid = np.zeros((MAX_GT_BOXES,), bool)
        gt_cls = np.zeros((MAX_GT_BOXES,), np.int32)
        for i, ob in enumerate(gt[:MAX_GT_BOXES]):
            gt_boxes[i] = ob.box_3d()
            gt_valid[i] = True
            gt_cls[i] = self.class_to_idx[ob.type]

        return HostSample(
            sample_id=sid,
            points=padded,
            points_mask=mask,
            # astype always copies; the canvas is already u8 on every path
            image=np.ascontiguousarray(img_canvas, np.uint8),
            p2=p2,
            ground_plane=plane.astype(np.float32),
            gt_boxes_3d=gt_boxes,
            gt_valid=gt_valid,
            gt_classes=gt_cls,
            image_scale=image_scale,
            raw_image_hw=raw_hw,
        )

    # ------------------------------------------------------------ iteration
    def epoch_ids(self, epoch: int) -> List[str]:
        ids = list(self.sample_ids)
        if self.cfg.shuffle:
            np.random.RandomState(self.cfg.seed + epoch).shuffle(ids)
        return ids

    def batches(
        self, batch_size: int, epoch: int = 0, augment: bool = True
    ) -> Iterator[tuple]:
        """Yield (stacked arrays tuple, sample_ids) per batch; drops the
        ragged tail batch (static shapes)."""

        ids = self.epoch_ids(epoch)
        for start in range(0, len(ids) - batch_size + 1, batch_size):
            chunk = ids[start : start + batch_size]
            canvas_b = self.alloc_image_batch(batch_size)
            samples = [
                self.load_sample(
                    sid,
                    # per-(epoch, sample) seed; non-numeric sample ids hash
                    # via crc32 so every sample still augments independently
                    augment_seed=(
                        (self.cfg.seed + epoch) * 100003
                        + (int(sid) if sid.isdigit() else zlib.crc32(sid.encode()))
                        if augment
                        else None
                    ),
                    image_out=canvas_b[j],
                )
                for j, sid in enumerate(chunk)
            ]
            yield self.stack_samples(samples, image_batch=canvas_b), chunk

    def alloc_image_batch(self, batch_size: int) -> np.ndarray:
        """Zeroed [B, H, W, 3] u8 canvas batch for ``image_out`` loading."""

        mc = self.model_cfg.image
        return np.zeros((batch_size, mc.height, mc.width, 3), np.uint8)

    def stack_samples(self, samples, image_batch=None) -> tuple:
        """HostSamples -> RawSample-ordered batch arrays, minimal copying.

        Point arrays stack as bucket-length PREFIX slices
        (``pad_or_subsample`` packs valid points first, so the slice is
        lossless) rather than stacking at the cap and trimming after. The
        image field — the dominant batch-assembly memcpy: 55 s of CPU over
        the 3.7k-frame TPU eval sweep, measured — is skipped entirely when
        the samples were loaded with ``image_out`` views into a
        caller-owned ``image_batch``.
        """

        sp = self.model_cfg.sparse_pool
        n = max(int(s.points_mask.sum()) for s in samples)
        b = min(pointcloud.pick_bucket(n, sp.buckets, sp.max_points),
                samples[0].points.shape[0])
        pts = np.stack([s.points[:b] for s in samples])
        mask = np.stack([s.points_mask[:b] for s in samples])
        if image_batch is None:
            image_batch = np.stack([s.image for s in samples])
        rest = tuple(
            np.stack([s.as_arrays()[i] for s in samples])
            for i in range(3, HostSample.NUM_ARRAYS)
        )
        return (pts, mask, image_batch) + rest

    def _bucket(self, stacked: tuple) -> tuple:
        """Trim the padded point arrays to the batch's point bucket."""

        pts, mask = pointcloud.trim_points_to_bucket(
            stacked[0], stacked[1], self.model_cfg.sparse_pool.buckets
        )
        return (pts, mask) + stacked[2:]
