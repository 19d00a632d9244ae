"""End-to-end detector model tests on the hermetic unittest config.

Eager (non-jitted) execution: the full-graph XLA CPU compile takes minutes,
while eager runs in seconds at the unittest sizes; the compiled path is
exercised on TPU by bench.py and __graft_entry__.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_pooling_tpu.configs import AreaExtents, unittest_config
from sparse_pooling_tpu.models import loss as loss_mod
from sparse_pooling_tpu.models import pipeline as pl
from sparse_pooling_tpu.models.detector import decode_detections_single


@pytest.fixture(scope="module")
def setup():
    cfg = unittest_config().model
    ext = AreaExtents()
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))

    rng = np.random.RandomState(0)
    p = cfg.sparse_pool.max_points
    pts = np.zeros((p, 3), np.float32)
    n = min(800, p)
    # ground points + a cluster at the GT car
    pts[:n, 0] = rng.uniform(-20, 20, n)
    pts[:n, 1] = 1.65
    pts[:n, 2] = rng.uniform(5, 50, n)
    pts[:200, 0] = rng.uniform(0.0, 2.0, 200)
    pts[:200, 1] = rng.uniform(0.6, 1.65, 200)
    pts[:200, 2] = rng.uniform(19.0, 23.0, 200)
    mask = np.zeros((p,), bool)
    mask[:n] = True

    gt = np.zeros((8, 7), np.float32)
    gt[0] = [1.0, 1.65, 21.0, 3.9, 1.6, 1.5, 0.1]
    raw = pl.RawSample(
        points=jnp.array(pts),
        points_mask=jnp.array(mask),
        image=jnp.full((cfg.image.height, cfg.image.width, 3), 128, jnp.uint8),
        p2=jnp.array([[70.0, 0, 156.0, 0], [0, 70.0, 48.0, 0], [0, 0, 1.0, 0]], jnp.float32),
        ground_plane=jnp.array([0.0, -1.0, 0.0, 1.65], jnp.float32),
        gt_boxes_3d=jnp.array(gt),
        gt_valid=jnp.zeros((8,), bool).at[0].set(True),
        gt_classes=jnp.zeros((8,), jnp.int32).at[0].set(1),
    )
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key},
        pl.build_model_inputs(raw, anchors_static, jnp.ones((2,), jnp.float32), cfg, ext),
        train=False,
    )
    return cfg, ext, model, anchors_static, raw, params


def test_forward_shapes(setup):
    cfg, ext, model, anchors_static, raw, params = setup
    out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, train=False)
    a = cfg.anchors.max_anchors
    p = cfg.rpn.eval_nms_size
    assert out["objectness"].shape == (a, 2)
    assert out["rpn_offsets"].shape == (a, 6)
    assert out["proposals"].shape == (p, 6)
    assert out["cls_logits"].shape == (p, cfg.num_classes + 1)
    assert out["box_offsets"].shape == (p, 10)
    assert out["orientation"].shape == (p, 2)
    assert bool(jnp.all(jnp.isfinite(out["proposals"])))


def test_anchor_filter_found_gt_region(setup):
    """Anchors must survive filtering near the GT point cluster."""

    cfg, ext, model, anchors_static, raw, params = setup
    out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, train=False)
    anch = np.asarray(out["anchors"])[np.asarray(out["anchor_valid"])]
    assert len(anch) > 0
    d = np.abs(anch[:, 0] - 1.0) + np.abs(anch[:, 2] - 21.0)
    assert d.min() < 3.0  # some anchor lands near the GT car


def test_decode_detections(setup):
    cfg, ext, model, anchors_static, raw, params = setup
    out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, train=False)
    det = decode_detections_single(out, raw.ground_plane, cfg, ext)
    k = cfg.avod.nms_size
    assert det["boxes_3d"].shape == (1, k, 7)
    assert det["scores"].shape == (1, k)
    finite = np.asarray(jnp.isfinite(det["boxes_3d"]))[np.asarray(det["valid"])]
    assert finite.all()


def test_loss_untrained_near_log2(setup):
    """Untrained objectness/cls CE should sit near log(2) (2-class chance)."""

    cfg, ext, model, anchors_static, raw, params = setup
    key = jax.random.PRNGKey(1)
    out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, train=True, rng=key)
    losses = loss_mod.detector_loss(
        out, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes, raw.ground_plane, key, cfg, ext
    )
    assert 0.2 < float(losses["rpn_objectness"]) < 2.0
    assert float(losses["total"]) > 0
    assert np.isfinite(float(losses["total"]))


def test_rpn_positives_exist_for_aligned_gt(setup):
    """A GT box aligned with the anchor grid must yield RPN positives."""

    cfg, ext, model, anchors_static, raw, params = setup
    # place GT exactly on an anchor center: centers at x = -38+4k, z = 2+4k
    gt = np.zeros((8, 7), np.float32)
    gt[0] = [2.0, 1.65, 22.0, 3.913, 1.629, 1.526, 0.0]
    raw2 = raw._replace(gt_boxes_3d=jnp.array(gt))
    key = jax.random.PRNGKey(2)
    out = pl.forward_single(model, params, raw2, anchors_static, cfg, ext, train=True, rng=key)
    losses = loss_mod.detector_loss(
        out, raw2.gt_boxes_3d, raw2.gt_valid, raw2.gt_classes, raw2.ground_plane, key, cfg, ext
    )
    assert float(losses["num_rpn_pos"]) >= 1


def test_strided_roi_paths_forward_and_close_to_exact(setup):
    """The production patch-einsum ROI config (bev/img_roi_stride > 1) must
    run end-to-end and produce proposals close to the full-res crop path:
    the heads consume pooled-lattice crops, so outputs differ slightly, but
    the top proposals should overlap heavily on an easy scene."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfg_strided = dataclasses.replace(
        cfg, rpn=dataclasses.replace(cfg.rpn, bev_roi_stride=2, img_roi_stride=2)
    )
    model2 = pl.make_model(cfg_strided, ext)
    out_exact = pl.forward_single(
        model, params, raw, anchors_static, cfg, ext, train=False
    )
    out_strided = pl.forward_single(
        model2, params, raw, anchors_static, cfg_strided, ext, train=False
    )
    assert out_strided["proposals"].shape == out_exact["proposals"].shape
    assert bool(jnp.all(jnp.isfinite(out_strided["proposals"])))
    # objectness scores over VALID anchors correlate strongly between paths
    valid = np.asarray(out_exact["anchor_valid"])
    a = np.asarray(out_exact["objectness"])[valid][:, 1]
    b = np.asarray(out_strided["objectness"])[valid][:, 1]
    if a.std() > 1e-6 and b.std() > 1e-6:
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, corr


def test_strided_roi_grads_finite(setup):
    """Training-path gradients must flow through the patch-einsum custom
    VJP (both views strided)."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfg_strided = dataclasses.replace(
        cfg, rpn=dataclasses.replace(cfg.rpn, bev_roi_stride=2, img_roi_stride=2)
    )
    model2 = pl.make_model(cfg_strided, ext)
    key = jax.random.PRNGKey(3)

    def loss_fn(p):
        out = pl.forward_single(
            model2, p, raw, anchors_static, cfg_strided, ext, train=True, rng=key
        )
        return loss_mod.detector_loss(
            out, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes,
            raw.ground_plane, key, cfg_strided, ext,
        )["total"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert np.isfinite(total) and total > 0


def test_box_8c_regression_head(setup):
    """box_rep='box_8c': 24-d head, finite loss with gradient, decodable."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfg8 = dataclasses.replace(
        cfg, avod=dataclasses.replace(cfg.avod, box_rep="box_8c")
    )
    model8 = pl.make_model(cfg8, ext)
    key = jax.random.PRNGKey(3)
    params8 = model8.init(
        {"params": key, "dropout": key},
        pl.build_model_inputs(raw, anchors_static, jnp.ones((2,), jnp.float32), cfg8, ext),
        train=False,
    )
    out = pl.forward_single(model8, params8, raw, anchors_static, cfg8, ext, train=False)
    p = cfg8.rpn.eval_nms_size
    assert out["box_offsets"].shape == (p, 24)
    det = decode_detections_single(out, raw.ground_plane, cfg8, ext)
    assert det["boxes_3d"].shape == (1, cfg8.avod.nms_size, 7)
    finite = np.asarray(jnp.isfinite(det["boxes_3d"]))[np.asarray(det["valid"])]
    assert finite.all()

    def loss_fn(pp):
        o = pl.forward_single(model8, pp, raw, anchors_static, cfg8, ext, train=True, rng=key)
        return loss_mod.detector_loss(
            o, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes,
            raw.ground_plane, key, cfg8, ext,
        )["total"]

    grads = jax.grad(loss_fn)(params8)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_explicit_flip_head(setup):
    """avod.explicit_flip_head: flip logits emitted, CE term in the loss
    with flowing grads, and decode resolves the pi side FROM the logits
    (forced logits flip every heading by exactly pi, boxes unchanged)."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfgf = dataclasses.replace(
        cfg,
        avod=dataclasses.replace(cfg.avod, explicit_flip_head=True),
        # relax the stage-2 positive band: the UNTRAINED model's proposals
        # rarely reach 0.65 IoU, and the flip CE (like the orientation
        # loss) is positive-weighted — without positives its grads are
        # legitimately zero and the wiring assertion below would be vacuous
        mini_batch=dataclasses.replace(
            cfg.mini_batch, avod_pos_iou=(0.05, 1.0), avod_neg_iou=(0.0, 0.03)
        ),
    )
    modelf = pl.make_model(cfgf, ext)
    key = jax.random.PRNGKey(11)
    paramsf = modelf.init(
        {"params": key, "dropout": key},
        pl.build_model_inputs(raw, anchors_static, jnp.ones((2,), jnp.float32), cfgf, ext),
        train=False,
    )
    out = pl.forward_single(modelf, paramsf, raw, anchors_static, cfgf, ext, train=False)
    p = cfgf.rpn.eval_nms_size
    assert out["flip_logits"].shape == (p, 2)

    # anchor-center-aligned GT; the untrained RPN's 16 random-scored
    # proposals almost never overlap it, so patch proposal 0 to the GT
    # anchor — the positive-weighted flip CE then has a guaranteed
    # positive while grads still flow through the model's flip logits
    gt = np.zeros((8, 7), np.float32)
    gt[0] = [2.0, 1.65, 22.0, 3.913, 1.629, 1.526, 0.1]
    raw2 = raw._replace(gt_boxes_3d=jnp.array(gt))
    from sparse_pooling_tpu.ops import encoders as enc

    gt_anchor = enc.box_3d_to_anchor(raw2.gt_boxes_3d)[0]

    def patched_forward(pp):
        o = pl.forward_single(
            modelf, pp, raw2, anchors_static, cfgf, ext, train=True, rng=key
        )
        o["proposals"] = o["proposals"].at[0].set(gt_anchor)
        return o

    losses = loss_mod.detector_loss(
        patched_forward(paramsf),
        raw2.gt_boxes_3d, raw2.gt_valid, raw2.gt_classes, raw2.ground_plane,
        key, cfgf, ext,
    )
    assert "flip" in losses and np.isfinite(float(losses["flip"]))
    assert float(losses["num_s2_pos"]) >= 1
    assert float(losses["flip"]) > 0

    def loss_fn(pp):
        return loss_mod.detector_loss(
            patched_forward(pp), raw2.gt_boxes_3d, raw2.gt_valid,
            raw2.gt_classes, raw2.ground_plane, key, cfgf, ext,
        )["total"]

    grads = jax.grad(loss_fn)(paramsf)
    flip_g = jax.tree_util.tree_leaves(
        grads["params"]["stage2_head"]["flip"]
    )
    assert sum(float(jnp.abs(g).sum()) for g in flip_g) > 0

    # decode side-resolution: force the logits to each side; headings must
    # differ by exactly pi with identical box footprints
    out0 = dict(out)
    out0["flip_logits"] = jnp.tile(jnp.array([[5.0, -5.0]]), (p, 1))
    out1 = dict(out)
    out1["flip_logits"] = jnp.tile(jnp.array([[-5.0, 5.0]]), (p, 1))
    det0 = decode_detections_single(out0, raw.ground_plane, cfgf, ext)
    det1 = decode_detections_single(out1, raw.ground_plane, cfgf, ext)
    np.testing.assert_allclose(
        np.asarray(det0["boxes_3d"][..., :6]),
        np.asarray(det1["boxes_3d"][..., :6]), atol=1e-6,
    )
    d = np.mod(
        np.asarray(det1["boxes_3d"][..., 6] - det0["boxes_3d"][..., 6]) + np.pi,
        2 * np.pi,
    ) - np.pi
    np.testing.assert_allclose(np.abs(d), np.pi, atol=1e-5)
    # and the canonical (mod-pi) fine angle equals the default decode's
    det_ref = decode_detections_single(out, raw.ground_plane, cfg, ext)
    from sparse_pooling_tpu.ops import encoders as enc

    np.testing.assert_allclose(
        np.asarray(enc.canonical_heading(det0["boxes_3d"][..., 6])),
        np.asarray(enc.canonical_heading(det_ref["boxes_3d"][..., 6])),
        atol=1e-5,
    )


@pytest.mark.parametrize("ftype,fmethod", [
    ("early", "concat"), ("late", "mean"), ("deep", "mean"), ("deep", "concat"),
])
def test_fusion_depth_axis_forward_and_grads(setup, ftype, fmethod):
    """Every (fusion_type, fusion_method) combination must produce the same
    output shapes and carry gradient into BOTH view branches (reference
    avod_model early/late/deep fusion axis)."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfg2 = dataclasses.replace(
        cfg, avod=dataclasses.replace(
            cfg.avod, fusion_type=ftype, fusion_method=fmethod
        )
    )
    model2 = pl.make_model(cfg2, ext)
    key = jax.random.PRNGKey(3)
    params2 = model2.init(
        {"params": key, "dropout": key},
        pl.build_model_inputs(raw, anchors_static, jnp.ones((2,), jnp.float32), cfg2, ext),
        train=False,
    )
    out = pl.forward_single(model2, params2, raw, anchors_static, cfg2, ext, train=False)
    p = cfg2.rpn.eval_nms_size
    assert out["cls_logits"].shape == (p, cfg2.num_classes + 1)
    assert out["box_offsets"].shape == (p, 10)
    assert bool(jnp.all(jnp.isfinite(out["cls_logits"])))

    def loss_fn(pp):
        o = pl.forward_single(model2, pp, raw, anchors_static, cfg2, ext, train=True, rng=key)
        return loss_mod.detector_loss(
            o, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes,
            raw.ground_plane, key, cfg2, ext,
        )["total"]

    grads = jax.grad(loss_fn)(params2)
    gsum = {
        "/".join(map(str, k)): float(jnp.abs(v).sum())
        for k, v in jax.tree_util.tree_leaves_with_path(grads)
    }
    assert np.isfinite(sum(gsum.values()))
    assert sum(v for k, v in gsum.items() if "bev_extractor" in k) > 0
    assert sum(v for k, v in gsum.items() if "img_extractor" in k) > 0
    if ftype in ("late", "deep"):
        # per-view FC stacks exist and receive gradient
        assert sum(v for k, v in gsum.items() if "fc1_v0" in k) > 0
        assert sum(v for k, v in gsum.items() if "fc1_v1" in k) > 0


def test_path_drop_zeroes_branch(setup):
    """With the image branch dropped, outputs must not depend on the image."""

    cfg, ext, model, anchors_static, raw, params = setup
    keep = jnp.array([1.0, 0.0])
    inp1 = pl.build_model_inputs(raw, anchors_static, keep, cfg, ext)
    out1 = model.apply(params, inp1, train=False)
    raw2 = raw._replace(image=jnp.zeros_like(raw.image))
    inp2 = pl.build_model_inputs(raw2, anchors_static, keep, cfg, ext)
    out2 = model.apply(params, inp2, train=False)
    np.testing.assert_allclose(
        np.asarray(out1["objectness"]), np.asarray(out2["objectness"]), atol=1e-5
    )


def test_grads_flow_to_both_branches(setup):
    cfg, ext, model, anchors_static, raw, params = setup
    key = jax.random.PRNGKey(3)

    def loss_fn(p):
        out = pl.forward_single(model, p, raw, anchors_static, cfg, ext, train=True, rng=key)
        return loss_mod.detector_loss(
            out, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes, raw.ground_plane, key, cfg, ext
        )["total"]

    grads = jax.grad(loss_fn)(params)
    flat = {"/".join(map(str, k)): v for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    gsum = {name: float(jnp.abs(g).sum()) for name, g in flat.items()}
    bev_g = sum(v for k, v in gsum.items() if "bev_extractor" in k)
    img_g = sum(v for k, v in gsum.items() if "img_extractor" in k)
    head_g = sum(v for k, v in gsum.items() if "rpn_head" in k or "stage2" in k)
    assert np.isfinite(sum(gsum.values()))
    assert head_g > 0
    assert bev_g > 0
    # with train rng key 3 both branches are kept, so the image branch must
    # receive real gradient (a dropped branch would make this exactly 0)
    assert img_g > 0


def test_space_to_depth_backbone_shapes_and_grads():
    """space_to_depth packs the input losslessly: identical mid/decoded
    shapes at decode_stride 2, gradients flow, and stride-1 decode is
    rejected (no stride-1 skip exists)."""

    from sparse_pooling_tpu.models.backbone import VggPyramidExtractor

    rng = np.random.RandomState(0)
    x = jnp.array(rng.rand(2, 16, 24, 6), jnp.float32)
    kw = dict(channels=(8, 16), blocks=(1, 1), out_channels=8,
              dtype=jnp.float32, decode_stride=2)
    plain = VggPyramidExtractor(**kw)
    s2d = VggPyramidExtractor(space_to_depth=True, **kw)
    key = jax.random.PRNGKey(0)
    p0 = plain.init(key, x)
    p1 = s2d.init(key, x)

    def run(mod, p):
        mid, skips = mod.apply(p, x, method="encode")
        return mid, mod.apply(p, mid, skips, method="decode")

    m0, d0 = run(plain, p0)
    m1, d1 = run(s2d, p1)
    assert m0.shape == m1.shape  # final stride unchanged
    assert d0.shape == d1.shape  # decode_stride-2 map unchanged

    g = jax.grad(lambda p: jnp.sum(run(s2d, p)[1] ** 2))(p1)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)

    with pytest.raises(ValueError, match="decode_stride"):
        VggPyramidExtractor(
            channels=(8, 16), blocks=(1, 1), out_channels=8,
            dtype=jnp.float32, decode_stride=1, space_to_depth=True,
        ).init(key, x)


def test_dense_grid_matches_capped_path(setup):
    """Dense-grid RPN (all anchors + occupancy mask) must produce the SAME
    proposal set as the capped/compacted path when the cap does not
    overflow — same candidate pool, same scores, same NMS."""

    import dataclasses

    from sparse_pooling_tpu.configs import unittest_config

    cfg, ext, model, anchors_static, raw, params = setup
    base = unittest_config().model
    dense_cfg = dataclasses.replace(
        base, rpn=dataclasses.replace(base.rpn, dense_grid=True)
    )
    capped_cfg = dataclasses.replace(
        base,
        anchors=dataclasses.replace(base.anchors, max_anchors=1024),
        rpn=dataclasses.replace(base.rpn, dense_grid=False),
    )
    keep = jnp.ones((1, 2), jnp.float32)
    batch = jax.tree.map(lambda x: x[None], raw)

    outs = {}
    for name, c in (("dense", dense_cfg), ("capped", capped_cfg)):
        m = pl.make_model(c, ext)
        grid = jnp.array(pl.static_anchor_grid(c, ext))
        inp = pl.build_model_inputs_batch(batch, grid, keep, c, ext)
        p = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                   inp, train=False)
        outs[name] = m.apply(p, inp, train=False)

    def prop_set(o):
        v = np.asarray(o["proposal_valid"][0])
        props = np.asarray(o["proposals"][0])[v]
        return {tuple(np.round(row, 3)) for row in props}

    # identical params: both inits see the same layer shapes (params are
    # anchor-count independent), seeded identically
    assert prop_set(outs["dense"]) == prop_set(outs["capped"])
    # dense valid mask covers at least the capped path's valid anchors
    assert int(np.asarray(outs["dense"]["anchor_valid"]).sum()) >= int(
        np.asarray(outs["capped"]["anchor_valid"]).sum()
    )


def test_dense_grid_quad_grouping_close_to_ungrouped(setup):
    """GxG-position window sharing (bev_roi_group) must not change the BEV
    ROI samples when spans fit the auto-grown window: proposals match the
    group=1 dense path."""

    import dataclasses

    from sparse_pooling_tpu.configs import unittest_config

    cfg, ext, model, anchors_static, raw, params = setup
    base = unittest_config().model
    mk = lambda g: dataclasses.replace(
        base,
        rpn=dataclasses.replace(
            base.rpn, dense_grid=True, bev_roi_stride=2, img_roi_stride=2,
            roi_channels=4, bev_roi_group=g,
        ),
    )
    keep = jnp.ones((1, 2), jnp.float32)
    batch = jax.tree.map(lambda x: x[None], raw)
    outs = {}
    for g in (1, 2):
        c = mk(g)
        m = pl.make_model(c, ext)
        grid = jnp.array(pl.static_anchor_grid(c, ext))
        inp = pl.build_model_inputs_batch(batch, grid, keep, c, ext)
        p = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                   inp, train=False)
        outs[g] = m.apply(p, inp, train=False)
    np.testing.assert_allclose(
        np.asarray(outs[1]["objectness"]), np.asarray(outs[2]["objectness"]),
        atol=2e-2,
    )
    v1 = np.asarray(outs[1]["proposal_valid"][0])
    v2 = np.asarray(outs[2]["proposal_valid"][0])
    p1 = {tuple(np.round(r, 2)) for r in np.asarray(outs[1]["proposals"][0])[v1]}
    p2 = {tuple(np.round(r, 2)) for r in np.asarray(outs[2]["proposals"][0])[v2]}
    assert p1 == p2


def test_quad_filter_matches_position_filter_sets(setup):
    """QxQ-block filtering keeps the same VALID anchor set as per-position
    filtering when neither cap overflows, with each block's Q*Q*V anchors
    contiguous in the kept array."""

    import dataclasses

    from sparse_pooling_tpu.configs.config import AnchorConfig, BevConfig
    from sparse_pooling_tpu.ops import anchors as anch

    cfg, ext, model, anchors_static, raw, params = setup
    acfg = AnchorConfig(sizes=(cfg.anchors.sizes[0],), stride=1.6)
    bev_cfg = BevConfig(voxel_size=0.8)
    rng = np.random.RandomState(0)
    grid = anch.generate_anchors_np(acfg, ext, np.array([0.0, -1.0, 0.0, 1.65]))
    h, w = bev_cfg.grid_hw(ext)
    occ = (rng.rand(2, h, w) > 0.97).astype(np.float32)
    ab = jnp.array(np.tile(grid[None].astype(np.float32), (2, 1, 1)))
    cap = grid.shape[0]  # no overflow
    cap -= cap % 8
    got = anch.filter_anchor_quads_grid(
        ab, jnp.array(occ), ext, bev_cfg, acfg, max_anchors=cap, quad=2
    )
    ref = anch.filter_anchor_positions_grid(
        ab, jnp.array(occ), ext, bev_cfg, acfg, max_anchors=cap
    )
    key = lambda r: {
        tuple(np.round(x, 3))
        for x in np.asarray(r.anchors[0])[np.asarray(r.valid[0])]
    }
    assert key(got) == key(ref)


def test_quad_filter_pads_non_divisible_grid(setup):
    """Grid dims NOT divisible by Q pad with empty positions; the kept
    valid anchor set still equals the per-position filter's (the people
    preset's 233x267 grid relies on this)."""

    from sparse_pooling_tpu.configs.config import AnchorConfig, BevConfig
    from sparse_pooling_tpu.ops import anchors as anch

    cfg, ext, model, anchors_static, raw, params = setup
    acfg = AnchorConfig(sizes=(cfg.anchors.sizes[0],), stride=1.6)
    bev_cfg = BevConfig(voxel_size=0.8)
    nz, nx = anch.grid_shape(acfg, ext)
    assert nz % 4 or nx % 4, "fixture grid must be non-divisible by 4"
    assert anch.quad_supported(acfg, bev_cfg, ext, 2048 - 2048 % 32, 4)
    rng = np.random.RandomState(1)
    grid = anch.generate_anchors_np(acfg, ext, np.array([0.0, -1.0, 0.0, 1.65]))
    h, w = bev_cfg.grid_hw(ext)
    occ = (rng.rand(2, h, w) > 0.97).astype(np.float32)
    ab = jnp.array(np.tile(grid[None].astype(np.float32), (2, 1, 1)))
    cap = grid.shape[0] * 16 // 1  # generous: no overflow even with Q^2 slack
    cap -= cap % 32
    got = anch.filter_anchor_quads_grid(
        ab, jnp.array(occ), ext, bev_cfg, acfg, max_anchors=cap, quad=4
    )
    ref = anch.filter_anchor_positions_grid(
        ab, jnp.array(occ), ext, bev_cfg, acfg, max_anchors=cap
    )
    key = lambda r: {
        tuple(np.round(x, 3))
        for x in np.asarray(r.anchors[0])[np.asarray(r.valid[0])]
    }
    assert key(got) == key(ref)


def test_quad_image_view_geometry_at_production_projection(setup):
    """Round-2 advisor: Q=4 block-shared IMAGE-view windows were suspected
    of being geometrically wrong at near range. Measured at the REAL cars
    projection geometry (fx ~181 pooled px, stride-4 image lattice), the
    block-shared window's sample displacement vs exact bilinear coords is
    DOMINATED by the span clamping the per-anchor windowed path already
    has: quad adds < 1 pooled cell of mean error on top, at every range
    band (near-range boxes span 20-100 pooled cells, so BOTH paths clamp
    to a centered context crop by design; exact sampling is available via
    img_roi_stride=1). This test pins that marginal-error bound.
    """

    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.ops import anchors as anchor_ops
    from sparse_pooling_tpu.ops import projection
    from sparse_pooling_tpu.ops.crop_resize import (
        _coords,
        _group_coords,
        _patch_coords,
    )

    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    Q, V = 4, 2
    grid = pl.static_anchor_grid(cfg, ext)
    fx = 721.0 * cfg.image.width / 1242.0
    fy = 721.0 * cfg.image.height / 375.0
    p2 = np.array(
        [[fx, 0, cfg.image.width / 2, 0], [0, fy, cfg.image.height / 2, 0],
         [0, 0, 1, 0]], np.float32,
    )
    img_hw = (cfg.image.height, cfg.image.width)
    boxes = projection.project_to_image_space(
        jnp.array(grid[None, :, :6]), jnp.array(p2)[None], img_hw
    )
    stride = cfg.rpn.img_roi_stride
    scale = np.array(
        [img_hw[0] - 1, img_hw[1] - 1, img_hw[0] - 1, img_hw[1] - 1], np.float32
    )
    bx = (np.asarray(boxes)[0] * scale - (stride - 1) / 2) / stride
    nz, nx = anchor_ops.grid_shape(cfg.anchors, ext)
    bq = jnp.array(
        bx.reshape(nz // Q, Q, nx // Q, Q, V, 4)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(1, -1, Q * Q * V, 4)
    )
    h_p, w_p = img_hw[0] // stride, img_hw[1] // stride
    spacing = cfg.anchors.stride / (cfg.bev.voxel_size * stride)
    patch = cfg.rpn.roi_patch + int(np.ceil((Q - 1) * spacing))
    s = cfg.rpn.proposal_roi_size

    ys_q, xs_q = _group_coords(bq, h_p, w_p, (s, s), patch)
    flat = bq.reshape(1, -1, 4)
    ys_ex, xs_ex = _coords(flat, h_p, w_p, (s, s))
    ys_pp, xs_pp = _patch_coords(flat, h_p, w_p, (s, s), cfg.rpn.roi_patch)

    err = lambda ys, xs: np.maximum(
        np.abs(np.asarray(ys - ys_ex))[0].max(-1),
        np.abs(np.asarray(xs - xs_ex))[0].max(-1),
    )
    err_quad, err_per = err(ys_q, xs_q), err(ys_pp, xs_pp)
    az = (
        grid[:, 2]
        .reshape(nz // Q, Q, nx // Q, Q, V)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1)
    )
    for lo, hi in [(0, 10), (10, 25), (25, 70)]:
        m = (az >= lo) & (az < hi)
        marginal = err_quad[m].mean() - err_per[m].mean()
        assert marginal < 1.0, (lo, hi, marginal)
    # far range (most anchors): the quad window is not materially worse
    far = az >= 40
    assert err_quad[far].mean() <= err_per[far].mean() + 0.5


def test_roi_quad_model_parity(setup):
    """roi_quad=2 (block-shared ROI windows) must reproduce the
    per-position model's proposals on an even-grid config."""

    import dataclasses

    from sparse_pooling_tpu.configs import unittest_config

    cfg, ext, model, anchors_static, raw, params = setup
    base = unittest_config().model
    mk = lambda q: dataclasses.replace(
        base,
        anchors=dataclasses.replace(base.anchors, stride=1.6, max_anchors=2048),
        rpn=dataclasses.replace(
            base.rpn, bev_roi_stride=2, img_roi_stride=2, roi_channels=4,
            roi_quad=q,
        ),
    )
    keep = jnp.ones((1, 2), jnp.float32)
    batch = jax.tree.map(lambda x: x[None], raw)
    outs = {}
    for q in (1, 2):
        c = mk(q)
        m = pl.make_model(c, ext)
        grid = jnp.array(pl.static_anchor_grid(c, ext))
        inp = pl.build_model_inputs_batch(batch, grid, keep, c, ext)
        p = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                   inp, train=False)
        outs[q] = m.apply(p, inp, train=False)
    for q in (1, 2):
        v = np.asarray(outs[q]["proposal_valid"][0])
        outs[q] = {tuple(np.round(r, 2)) for r in np.asarray(outs[q]["proposals"][0])[v]}
    assert outs[1] == outs[2]


def test_stage2_patch_roi_forward_close_and_grads(setup):
    """avod.bev/img_roi_stride > 1 (stage-2 patch-einsum crops) must run
    end-to-end with detections close to the exact-crop path on an easy
    scene, and training gradients must flow through the custom VJP."""

    import dataclasses

    cfg, ext, model, anchors_static, raw, params = setup
    cfg_s = dataclasses.replace(
        cfg, avod=dataclasses.replace(
            cfg.avod, bev_roi_stride=2, img_roi_stride=2, roi_patch=16
        )
    )
    model2 = pl.make_model(cfg_s, ext)
    out_exact = pl.forward_single(
        model, params, raw, anchors_static, cfg, ext, train=False
    )
    out_s = pl.forward_single(
        model2, params, raw, anchors_static, cfg_s, ext, train=False
    )
    assert out_s["cls_logits"].shape == out_exact["cls_logits"].shape
    assert bool(jnp.all(jnp.isfinite(out_s["box_offsets"])))
    # stage-2 class logits over the shared proposals correlate strongly
    a = np.asarray(out_exact["cls_logits"]).reshape(-1)
    b = np.asarray(out_s["cls_logits"]).reshape(-1)
    if a.std() > 1e-6 and b.std() > 1e-6:
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, corr
    det = decode_detections_single(out_s, raw.ground_plane, cfg_s, ext)
    finite = np.asarray(jnp.isfinite(det["boxes_3d"]))[np.asarray(det["valid"])]
    assert finite.all()

    key = jax.random.PRNGKey(3)

    def loss_fn(p):
        out = pl.forward_single(
            model2, p, raw, anchors_static, cfg_s, ext, train=True, rng=key
        )
        return loss_mod.detector_loss(
            out, raw.gt_boxes_3d, raw.gt_valid, raw.gt_classes,
            raw.ground_plane, key, cfg_s, ext,
        )["total"]

    grads = jax.grad(loss_fn)(params)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_backbone_remat_grads_exact():
    """backbone.remat=True (nn.remat encoder/decoder) must change memory
    behavior only: forward outputs and every grad leaf bit-match the
    non-remat module (jax.checkpoint recomputes the same ops)."""

    from sparse_pooling_tpu.models.backbone import VggPyramidExtractor

    def mk(remat):
        return VggPyramidExtractor(
            (8, 16), (2, 2), 8, jnp.float32, decode_stride=1,
            space_to_depth=False, remat=remat,
        )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    m0, m1 = mk(False), mk(True)
    params = m0.init(jax.random.PRNGKey(1), x)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x) ** 2)

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    l1, g1 = jax.value_and_grad(loss(m1))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_voxelizer_pipeline_matches_unpacked(setup):
    """With space_to_depth the pipeline scatters straight into the packed
    layout (bev_device.bev_maps_packed_batch); the model forward must be
    IDENTICAL to building the full-res raster and packing in the encoder."""

    import dataclasses

    _, ext, _, _, raw, _ = setup
    base = unittest_config().model
    cfg = dataclasses.replace(
        base,
        backbone=dataclasses.replace(
            base.backbone, channels=(8, 16, 16), blocks=(1, 1, 1),
            decode_stride=2, space_to_depth=True,
        ),
        sparse_pool=dataclasses.replace(base.sparse_pool, fusion_stride=4),
        rpn=dataclasses.replace(
            base.rpn, bev_roi_stride=2, img_roi_stride=2
        ),
    )
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))
    batch = jax.tree.map(lambda x: x[None], raw)
    keep = jnp.ones((1, 2), jnp.float32)

    inputs_p = pl.build_model_inputs_batch(batch, anchors_static, keep, cfg, ext)
    nch = cfg.bev.height_slices + 1
    hp, w = cfg.bev.padded_hw(ext)
    assert inputs_p["bev_input"].shape == (1, hp // 2, w // 2, 4 * nch)

    # unpacked twin: same config except the input builder's packing is off
    cfg_u = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, space_to_depth=False)
    )
    inputs_u = pl.build_model_inputs_batch(batch, anchors_static, keep, cfg_u, ext)
    assert inputs_u["bev_input"].shape == (1, hp, w, nch)
    # identical anchor filtering (the occupancy raster semantics match)
    np.testing.assert_array_equal(
        np.asarray(inputs_p["anchor_valid"]), np.asarray(inputs_u["anchor_valid"])
    )
    np.testing.assert_array_equal(
        np.asarray(inputs_p["anchors"]), np.asarray(inputs_u["anchors"])
    )

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, inputs_p, train=False)
    out_p = model.apply(params, inputs_p, train=False)
    # same model consumes the UNPACKED raster (encoder packs internally)
    out_u = model.apply(params, inputs_u, train=False)
    for k in out_p:
        np.testing.assert_array_equal(
            np.asarray(out_p[k]), np.asarray(out_u[k]), err_msg=k
        )
