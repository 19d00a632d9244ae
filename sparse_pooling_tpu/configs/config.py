"""Typed hierarchical configuration.

Idiomatic replacement for the reference's protobuf text-format config schema
(``avod/protos/{pipeline,model,train,eval,kitti_utils,mini_batch}.proto`` +
``avod/builders/config_builder_util.py``): the same knob tree — BEV area
extents, voxel size, anchor strides, NMS sizes, path-drop probabilities, LR
decay, minibatch IoU bands — expressed as frozen dataclasses that are
hashable, so a config can be a static argument to ``jax.jit``.

TPU-first deviations from the reference are called out inline; all shapes are
static so every model built from one config compiles to a single XLA graph.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple


def _freeze(cls):
    return dataclasses.dataclass(frozen=True)(cls)


@_freeze
class AreaExtents:
    """BEV area extents in the camera frame (meters).

    Reference: ``kitti_utils.proto`` area_extents [[-40,40],[-5,3],[0,70]].
    """

    x_min: float = -40.0
    x_max: float = 40.0
    y_min: float = -5.0  # height axis (camera y points down)
    y_max: float = 3.0
    z_min: float = 0.0
    z_max: float = 70.0

    @property
    def xz(self) -> Tuple[Tuple[float, float], Tuple[float, float]]:
        return ((self.x_min, self.x_max), (self.z_min, self.z_max))


@_freeze
class BevConfig:
    """BEV rasterization (reference: ``bev_generators/bev_slices.py``).

    The raw lattice is H x W = z-cells x x-cells = 700 x 800 at 0.1 m.
    ``pad_h`` rows of zero padding are appended so the network input height is
    divisible by the pyramid stride (TPU/static-shape deviation; the reference
    feeds 700 directly).
    """

    voxel_size: float = 0.1
    height_slices: int = 5  # + 1 density channel => 6 input channels
    height_lo: float = -0.2  # meters above ground plane, slice range start
    height_hi: float = 2.3  # slice range end
    density_log_norm: float = 16.0  # density = min(1, log(n+1)/log(16))
    pad_h: int = 4  # 700 -> 704

    def grid_hw(self, extents: AreaExtents) -> Tuple[int, int]:
        h = int(round((extents.z_max - extents.z_min) / self.voxel_size))
        w = int(round((extents.x_max - extents.x_min) / self.voxel_size))
        return h, w

    def padded_hw(self, extents: AreaExtents) -> Tuple[int, int]:
        h, w = self.grid_hw(extents)
        return h + self.pad_h, w

    @property
    def num_channels(self) -> int:
        return self.height_slices + 1


@_freeze
class ImageConfig:
    """Fixed camera-image input lattice.

    The reference feeds variable-size KITTI images (~370x1242); TPU/XLA needs
    static shapes, so images are scaled+padded onto a fixed canvas divisible
    by the pyramid stride.
    """

    height: int = 384
    width: int = 1248
    channels: int = 3
    # True: the host pads the raw decoded image into the canvas (top-left)
    # and the jitted graph resizes it with two separable bilinear matmuls
    # (ops.image_resize) — removes the 18.6 ms/frame host PIL resize that
    # dominated the eval loader on a 1-core VM. False: host PIL resize
    # (the round-1/2 behavior). Falls back to host resize per frame when
    # the raw image exceeds the canvas (device path needs the raw content
    # to fit).
    device_resize: bool = True


@_freeze
class SparsePoolConfig:
    """SHPL sparse cross-view pooling (the novel op).

    Reference: per-frame COO built host-side in ``kitti_utils`` fork code and
    consumed by ``tf.sparse_tensor_dense_matmul`` inside the fusion feature
    extractor. Here the correspondence is compiled to fixed-capacity ELL
    tables (per target cell: up to ``ell_k`` (source index, bilinear weight)
    pairs) at a configurable fusion stride.
    """

    fusion_stride: int = 8  # fuse at 1/8-resolution feature lattices
    # Static point-capacity BUCKETS below max_points: the host pads each
    # batch to the smallest bucket holding every frame's valid points
    # instead of always to max_points, so the voxelizer / COO build /
    # SHPL pooling costs track the TRUE point count (~16k on KITTI-like
    # frames vs the 32k cap — the pooling scatters B*P entries at
    # ~18 ns/entry, so half the padding was half the fusion cost wasted).
    # Each bucket compiles its own XLA graph (bounded recompilation:
    # len(buckets)+1 graphs); () disables bucketing. Buckets >= max_points
    # are ignored, so small-cap configs (unittest) are unaffected.
    point_buckets: Tuple[int, ...] = (8192, 16384)
    # Device representation of M. "coo" (default) is exact: gather + sorted
    # segment-sum, measured ~30 us/frame on TPU v5e. "ell" keeps only the
    # top-K sources per target cell (renormalized) — an approximation that
    # cuts host->device transfer ~10x; K below.
    method: str = "coo"
    # dtype the pooling's fused segment-sum ACCUMULATES in. "bfloat16"
    # halves the scatter-accumulator HBM traffic (the pooling's dominant
    # byte stream); per-cell entry counts are small so the accumulation
    # error is ~1e-2 relative, and the custom-VJP backward is unchanged
    # (grads bit-identical). Certify AP via the hard-scene 40-pt checks
    # before flipping a preset default.
    accum_dtype: str = "float32"
    ell_k: int = 8  # max source contributions kept per target cell (ELL only)
    max_points: int = 32768  # host pads/filters point cloud to this cap
    normalize: bool = True  # row-normalize pooled features by total weight
    bev_to_img: bool = True  # also pool BEV features into the image branch
    # >0: learned 1x1 bottleneck on the source features before pooling —
    # pooling cost is linear in channels, and 256->64 keeps cross-view
    # information at 1/4 the HBM traffic. 0 pools the full source width
    # (the reference pools all mid channels).
    pool_channels: int = 64

    @property
    def coo_cap(self) -> int:
        return 4 * self.max_points

    @property
    def buckets(self) -> Tuple[int, ...]:
        """Ascending effective point capacities (always ends at max_points)."""

        below = sorted({int(b) for b in self.point_buckets if 0 < b < self.max_points})
        return tuple(below) + (self.max_points,)


@_freeze
class AnchorConfig:
    """3D grid anchors (reference: ``grid_anchor_3d_generator.py``)."""

    stride: float = 0.5  # meters, both x and z
    # Per-class (length, width, height) anchor sizes; the reference clusters
    # GT dimensions per class (label_cluster_utils). These are the standard
    # KITTI cluster centroids.
    sizes: Tuple[Tuple[float, float, float], ...] = ((3.9, 1.6, 1.56),)
    rotations: Tuple[float, ...] = (0.0, 1.5707963267948966)
    max_anchors: int = 16384  # static cap after the empty-anchor filter
    density_threshold: int = 1  # min points in footprint to keep an anchor


@_freeze
class MiniBatchConfig:
    """Anchor/proposal sampling (reference: ``mini_batch_utils.py``).

    IoU bands follow the reference defaults for cars: RPN negatives
    [0, 0.3), positives [0.5, 1]; stage-2 negatives [0, 0.55), positives
    [0.65, 1].
    """

    rpn_batch_size: int = 512
    rpn_neg_iou: Tuple[float, float] = (0.0, 0.3)
    rpn_pos_iou: Tuple[float, float] = (0.5, 1.0)
    avod_batch_size: int = 1024
    avod_neg_iou: Tuple[float, float] = (0.0, 0.55)
    avod_pos_iou: Tuple[float, float] = (0.65, 1.0)


@_freeze
class BackboneConfig:
    """VGG-pyramid feature extractor (reference: ``feature_extractors/*_vgg_pyramid.py``)."""

    channels: Tuple[int, ...] = (32, 64, 128, 256)  # encoder stage widths
    blocks: Tuple[int, ...] = (2, 2, 3, 3)  # convs per stage
    out_channels: int = 32  # 1x1 bottleneck on the decoded map
    # Output stride of the decoded feature maps (power of 2). The reference
    # decodes to full resolution (1); 2 skips the most expensive decoder
    # level — full-res convs feed ONLY the stage-2 ROI crops, which sample
    # a stride-2 lattice nearly as well at half the decode cost. Crop
    # coordinates account for the stride exactly (cell-center alignment).
    decode_stride: int = 2
    # Pack 2x2 input pixels into channels and skip the first pool: stage 1
    # runs at stride 2 on 4x channels (lossless input rearrangement; the
    # raw 6-channel first conv wastes the 128-wide MXU and stage-1 burns
    # full-res FLOPs). Requires decode_stride >= 2. See models/backbone.py.
    space_to_depth: bool = True
    # Rematerialize (jax.checkpoint) the conv encoder/decoder in the
    # backward pass: intra-stage conv activations are recomputed instead of
    # stored, trading FLOPs for HBM. Forward-only graphs are unaffected.
    # See models/backbone.py for the measured batch-scaling effect.
    remat: bool = False
    l2_weight_decay: float = 0.0005
    compute_dtype: str = "bfloat16"  # TPU MXU-native; params stay fp32


@_freeze
class RpnConfig:
    """Region proposal network (reference: ``models/rpn_model.py``)."""

    proposal_roi_size: int = 3  # crop_and_resize 3x3
    # >1: RPN BEV ROIs crop from an avg-pooled (stride) map via the
    # patch-einsum path — 1 gather descriptor per anchor instead of 9
    # (descriptor latency dominates TPU gathers; ROADMAP.md). 8 keeps
    # car-sized boxes (4.2 m diagonal = 5.3 pooled cells <= patch-2) inside
    # the 8x8 window at 0.1 m voxels, so sampling stays exact bilinear on
    # the pooled lattice. Set 1 for reference-exact full-res crops.
    bev_roi_stride: int = 8
    # Same lever for the image view: RPN image ROIs crop one centered 8x8
    # patch from a stride-pooled image feature map. Unlike BEV, near
    # objects can span more than the window (then the 3x3 samples clamp to
    # a centered context crop) — distant/hard objects fit exactly.
    img_roi_stride: int = 4
    roi_patch: int = 8  # patch-einsum window size (both views)
    # >0: learned 1x1 projection on the POOLED map before the patch crop.
    # The patch gather is HBM-bound in the gathered bytes (~24 ms/batch at
    # 32 channels, tools/profile_micro.py), so 32->8 cuts the RPN ROI cost
    # ~4x; the RPN head keeps 3x3xroi_channels features per anchor.
    # Applies only to the strided patch path; 0 disables.
    roi_channels: int = 8
    # Score the FULL regular anchor grid with an occupancy-mask instead of
    # compacting a capped nonempty subset: no cap, no truncation (CLOSER to
    # the reference, which scores every nonempty anchor), no per-position
    # compaction gathers in the hot path — and the regular layout lets the
    # BEV ROI crop share one window across a GxG block of neighbor
    # positions (bev_roi_group) with pure static reshapes. Requires an
    # integer anchor-stride / voxel ratio. anchors.max_anchors is ignored
    # on this path (the anchor count is the full grid).
    # MEASURED SLOWER as the default (47.3 vs 61.7 fps on the cars lattice:
    # 2.7x the anchors through the ROI einsums / head / NMS outweighs the
    # grouped-gather savings); default False — enable when no-truncation
    # semantics matter more than throughput (parity-tested equal to the
    # capped path whenever the cap does not overflow).
    dense_grid: bool = False
    # GxG neighbor positions per shared BEV ROI window (dense_grid only).
    # Positions sit stride/(voxel*bev_roi_stride) pooled cells apart
    # (0.625 for cars), so a G=4 block adds <2 cells to the window span;
    # the window size auto-grows to keep sampling exact. Degrades to the
    # largest divisor of the grid dims.
    bev_roi_group: int = 4
    # >1 (capped path): the anchor filter keeps whole QxQ-position blocks,
    # so the kept array stays block-contiguous and the ROI crops share one
    # window per BLOCK (descriptors / Q^2 on the descriptor-bound gather —
    # the unexplored middle between per-position grouping and the
    # measured-slower dense grid). Costs cap capacity: a block with one
    # nonempty position occupies Q^2 * V anchor slots (empty variants are
    # masked invalid). Falls back to per-position filtering when the grid
    # dims aren't divisible by Q. 1 = per-position (default).
    roi_quad: int = 1
    fusion_channels: int = 256  # conv head width after ROI fusion
    nms_iou_thresh: float = 0.8
    train_nms_size: int = 1024
    eval_nms_size: int = 300
    pre_nms_top_k: int = 4096
    loss_objectness_weight: float = 1.0
    loss_regression_weight: float = 5.0


@_freeze
class AvodStage2Config:
    """Second-stage detection head (reference: ``models/avod_model.py``)."""

    roi_size: int = 7  # crop_and_resize 7x7
    # >1: stage-2 ROIs crop ONE patch-einsum window per proposal from an
    # avg-pooled (stride, in full-res pixels) feature map instead of the
    # exact flattened gather's roi_size^2 sample points — the same
    # descriptor-latency lever as RpnConfig.bev_roi_stride, applied to the
    # B*P*2-view stage-2 crop. Sampling is exact bilinear on the pooled
    # lattice while a proposal's span fits in roi_patch-2 pooled cells
    # (cars: diag ~5.5 m = 13.75 cells at stride 4 / 0.1 m voxels, so
    # patch 16 keeps every car exact); larger spans clamp to a centered
    # context crop. 1 = reference-exact full-res crops (default).
    bev_roi_stride: int = 1
    img_roi_stride: int = 1
    roi_patch: int = 16
    fc_layers: Tuple[int, ...] = (2048, 2048, 2048)
    keep_dropout_prob: float = 0.5
    fusion_method: str = "mean"  # 'mean' | 'concat' (the combiner)
    # WHERE the two views fuse in the stage-2 FC stack (reference
    # avod_model fusion type axis):
    #   'early' — combine ROI features once, one shared FC stack;
    #   'late'  — a full FC stack per view, outputs combined at the end;
    #   'deep'  — per-layer branch FCs whose outputs re-combine after
    #             every layer (AVOD's deep fusion).
    fusion_type: str = "early"
    nms_iou_thresh: float = 0.01
    nms_size: int = 100
    loss_cls_weight: float = 1.0
    loss_reg_weight: float = 5.0
    loss_ang_weight: float = 1.0
    # Explicit pi-disambiguation head (DEFAULT since round 5). Stage 2 adds
    # a 2-logit front/back head trained with CE on the GT heading side
    # (side = outside the canonical band [-pi/2, pi/2), see
    # ops.encoders.heading_flip_bit); decode resolves the pi flip from this
    # logit instead of the angle-vector direction, while the box regression
    # (AVOD family) / angle vector (rcnn family) keeps the fine mod-pi
    # angle. The angle-vector head and loss remain (reference parity).
    # Certified on the heading-asymmetric oracle at 48-val x 2 seeds
    # (BASELINE.md round 5): AOS == 2D AP (0.921 moderate), pi-flip rate
    # 0.4-1.8% vs GT, and BETTER 3D than the implicit angle-vector
    # (0.920 +/- 0.003 vs 0.902 +/- 0.009 — decoupling the side bit also
    # stabilizes the fine regression). Set False for reference-exact
    # decode semantics (flip toward the angle-vector heading).
    explicit_flip_head: bool = True
    loss_flip_weight: float = 1.0
    # Stage-2 box regression target: "box_4c" (10-d, 4 ground corners + 2
    # heights — the AVOD representation), "box_8c" (24-d full corners —
    # MV3D's corner regression), or "offsets" (6-d anchor offsets —
    # rcnn-family only; the AVOD-style detector rejects it).
    box_rep: str = "box_4c"
    # Treat NMS-selected proposals as constants for stage 2 (the
    # Faster-R-CNN/MV3D convention: no gradient through proposal box
    # COORDINATES into the RPN; the RPN still trains through its own loss).
    # False additionally backprops stage-2 ROI-crop box gradients into the
    # RPN offsets — ill-conditioned through the NMS selection and a
    # measured ~20 ms/step of re-gather work at batch 4.
    stop_gradient_proposals: bool = True


@_freeze
class PathDropConfig:
    """Branch path-drop regularization (reference: rpn_model path_drop).

    With probability keep both; otherwise drop one branch's features (never
    both). Probabilities follow the reference example config (0.9, 0.9).
    """

    bev_keep_prob: float = 0.9
    img_keep_prob: float = 0.9
    enabled: bool = True


@_freeze
class ModelConfig:
    # "avod": the flagship two-stage AVOD-style detector (crop-based RPN,
    # box_4c stage 2). "rcnn": the MV3D-style FusionRcnn second consumer
    # (dense conv RPN, anchor-offset stage 2).
    architecture: str = "avod"
    classes: Tuple[str, ...] = ("Car",)
    bev: BevConfig = BevConfig()
    image: ImageConfig = ImageConfig()
    sparse_pool: SparsePoolConfig = SparsePoolConfig()
    anchors: AnchorConfig = AnchorConfig()
    mini_batch: MiniBatchConfig = MiniBatchConfig()
    backbone: BackboneConfig = BackboneConfig()
    rpn: RpnConfig = RpnConfig()
    avod: AvodStage2Config = AvodStage2Config()
    path_drop: PathDropConfig = PathDropConfig()

    @property
    def num_classes(self) -> int:
        return len(self.classes)


@_freeze
class OptimizerConfig:
    """Adam + exponential LR decay (reference: ``optimizer_builder`` + train.proto)."""

    name: str = "adam"
    initial_lr: float = 1e-4
    decay_steps: int = 30000
    decay_rate: float = 0.8
    staircase: bool = True
    grad_clip_norm: float = 0.0  # 0 disables


@_freeze
class TrainConfig:
    batch_size: int = 1
    max_iterations: int = 120000
    checkpoint_interval: int = 1000
    summary_interval: int = 10
    max_checkpoints_to_keep: int = 10000  # keep-all so the evaluator can sweep
    optimizer: OptimizerConfig = OptimizerConfig()
    data_parallel: bool = True  # shard batch over the 'data' mesh axis
    # >1: also split the stage-2 FC stack over a 'model' mesh axis (tensor
    # parallelism; see parallel.mesh.param_sharding_rules). devices are laid
    # out (data, model), so model-parallel groups ride adjacent ICI links.
    model_parallel: int = 1
    prefetch_depth: int = 2  # double-buffered host->device pipeline


@_freeze
class EvalConfig:
    score_threshold: float = 0.1
    # val sweeps run batched (bench-shape graph) with a prefetched host
    # pipeline; the tail batch is padded. 8 matches bench.py.
    batch_size: int = 8
    eval_interval: int = 1000  # evaluate every new checkpoint >= this spacing
    kitti_score_threshold: float = 0.1
    # threads loading samples WITHIN a val batch (PNG decode + pad release
    # the GIL); the DevicePrefetcher overlaps across batches
    num_workers: int = 4
    # dispatched-but-unread eval batches kept in flight: overlaps the
    # remote runtime's per-call round trip (~0.7 s/batch tunneled, 8x the
    # graph time) with device execution. 1 = fully synchronous.
    inflight_batches: int = 2
    # batches whose packed detections are device-stacked and read back in
    # ONE transfer: the blocking device->host fetch is round-trip-LATENCY
    # bound through the tunneled runtime (readback measured 94-227 s of a
    # 3.7k-frame sweep at 464 per-batch fetches of ~86 KB each), so fewer,
    # bigger fetches win. 1 = per-batch readback.
    readback_group: int = 8
    # drain readback groups on a dedicated writer THREAD: the blocking
    # device->host fetch holds the consumer for ~115 ms/batch-group through
    # the tunneled runtime, and txt rendering is GIL-releasing C — moving
    # both off the dispatch thread lets them overlap the sample loader on a
    # single-core host (the measured sweep regime). False -> inline drain.
    async_writer: bool = True
    # shard the val batch over every visible device (pure DP mesh; params
    # replicate). False -> single-device eval.
    data_parallel: bool = True
    # also dump RPN proposals per frame (reference evaluator writes BOTH
    # proposals and final detections: proposals_and_scores txt rows
    # "x y z dx dy dz score" in anchor form). Off by default: it grows the
    # per-batch readback payload by [B, P, 8].
    save_rpn_proposals: bool = False
    # AP interpolation points for the offline evaluator: 11 = the classic
    # protocol (matches the reference's devkit default), 40 = the modern
    # KITTI protocol. 40 resolves finer precision/recall structure — the
    # 11-point grid saturates at 10/11 bands on small val sets, hiding
    # small regressions (round-3 verdict: "a check that cannot go UP cannot
    # detect small regressions DOWN either").
    ap_n_points: int = 11


@_freeze
class DatasetConfig:
    """KITTI dataset (reference: ``avod/datasets/kitti/kitti_dataset.py``)."""

    root: str = "/data/kitti/object"
    # decode-once image cache dir ("" = off): repeated checkpoint sweeps
    # re-decode the same val PNGs once per checkpoint (~3.5 ms/frame of the
    # sweep host budget); with a cache dir, decoded raw images persist as
    # .npy and later touches are a ~0.3 ms mmap copy.
    image_cache_dir: str = ""
    split: str = "train"  # train | val | trainval | test
    data_dir: str = "training"  # training | testing
    aug_flip: bool = True
    aug_pca_jitter: bool = True
    shuffle: bool = True
    seed: int = 0


@_freeze
class PipelineConfig:
    """Top-level config (reference: ``pipeline.proto``)."""

    checkpoint_name: str = "pyramid_cars_shpl"
    experiments_dir: str = "experiments"
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()
    dataset: DatasetConfig = DatasetConfig()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _build(cls, data: Any):
    if dataclasses.is_dataclass(cls) and isinstance(data, dict):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for key, value in data.items():
            if key not in fields:
                raise KeyError(f"unknown config field {cls.__name__}.{key}")
            ftype = fields[key].type
            default = getattr(cls, key, fields[key].default)
            if dataclasses.is_dataclass(type(default)):
                kwargs[key] = _build(type(default), value)
            elif isinstance(value, list):
                kwargs[key] = tuple(tuple(v) if isinstance(v, list) else v for v in value)
            else:
                kwargs[key] = value
            del ftype
        return cls(**kwargs)
    return data


def pipeline_config_from_dict(data: dict) -> PipelineConfig:
    """Parse a (possibly partial) nested dict into a PipelineConfig.

    Capability parity with ``config_builder_util.get_configs_from_pipeline_file``:
    unknown keys raise, missing keys take defaults.
    """

    return _build(PipelineConfig, data)


def pipeline_config_from_file(path: str) -> PipelineConfig:
    with open(path) as f:
        return pipeline_config_from_dict(json.load(f))
