"""MV3D-style FusionRcnn: second consumer of the SHPL layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_pooling_tpu.configs import AreaExtents, unittest_config
from sparse_pooling_tpu.models import fusion_rcnn as fr
from sparse_pooling_tpu.models import pipeline as pl


@pytest.fixture(scope="module")
def setup():
    import dataclasses

    # the family's historical stage-2 target; box_4c/box_8c are covered by
    # test_rcnn_corner_box_reps
    cfg = unittest_config().model
    cfg = dataclasses.replace(
        cfg, avod=dataclasses.replace(cfg.avod, box_rep="offsets")
    )
    ext = AreaExtents()
    model = fr.FusionRcnn(cfg=cfg, extents=ext)
    anchors = jnp.array(fr.rcnn_anchor_grid(cfg, ext))

    rng = np.random.RandomState(0)
    p = cfg.sparse_pool.max_points
    pts = np.zeros((p, 3), np.float32)
    n = 600
    pts[:n, 0] = rng.uniform(-20, 20, n)
    pts[:n, 1] = 1.65
    pts[:n, 2] = rng.uniform(5, 50, n)
    mask = np.zeros((p,), bool)
    mask[:n] = True
    raw = pl.RawSample(
        points=jnp.array(pts), points_mask=jnp.array(mask),
        image=jnp.full((cfg.image.height, cfg.image.width, 3), 100, jnp.uint8),
        p2=jnp.array([[70.0, 0, 80.0, 0], [0, 70.0, 24.0, 0], [0, 0, 1.0, 0]], jnp.float32),
        ground_plane=jnp.array([0.0, -1.0, 0.0, 1.65], jnp.float32),
        gt_boxes_3d=jnp.zeros((8, 7)).at[0].set(jnp.array([1.0, 1.65, 21.0, 3.9, 1.6, 1.5, 0.2])),
        gt_valid=jnp.zeros((8,), bool).at[0].set(True),
        gt_classes=jnp.zeros((8,), jnp.int32).at[0].set(1),
    )
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), raw)
    inputs = pl.build_model_inputs_batch(
        batch, jnp.array(pl.static_anchor_grid(cfg, ext)),
        jnp.ones((2, 2), jnp.float32), cfg, ext,
    )
    # replace AVOD's filtered anchors with the dense R-CNN grid (ground y)
    from sparse_pooling_tpu.models.pipeline import anchors_with_ground_y

    dense = jax.vmap(lambda pl_: anchors_with_ground_y(anchors, pl_))(batch.ground_plane)
    inputs["anchors"] = dense
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, inputs, train=False)
    return cfg, ext, model, inputs, batch, params


def test_anchor_grid_layout():
    cfg = unittest_config().model
    ext = AreaExtents()
    grid = fr.rcnn_anchor_grid(cfg, ext)
    s = cfg.sparse_pool.fusion_stride
    bh, bw = cfg.bev.padded_hw(ext)
    assert grid.shape == ((bh // s) * (bw // s) * 2, 8)
    # rotations interleave per cell and swap footprints
    np.testing.assert_allclose(grid[0, [3, 5]], [3.913, 1.629], atol=1e-3)
    np.testing.assert_allclose(grid[1, [3, 5]], [1.629, 3.913], atol=1e-3)
    np.testing.assert_allclose(grid[0, [0, 2]], grid[1, [0, 2]])


def test_forward_shapes(setup):
    cfg, ext, model, inputs, batch, params = setup
    out = model.apply(params, inputs, train=False)
    b = 2
    a = inputs["anchors"].shape[1]
    p = cfg.rpn.eval_nms_size
    assert out["objectness"].shape == (b, a, 2)
    assert out["proposals"].shape == (b, p, 6)
    assert out["cls_logits"].shape == (b, p, cfg.num_classes + 1)
    assert out["box_offsets"].shape == (b, p, 6)
    assert bool(jnp.isfinite(out["proposals"]).all())


def test_decode_and_loss(setup):
    cfg, ext, model, inputs, batch, params = setup
    out = model.apply(params, inputs, train=False)
    det = fr.decode_rcnn_detections(out, cfg, ext)
    assert det["boxes_3d"].shape == (2, 1, cfg.avod.nms_size, 7)

    key = jax.random.PRNGKey(1)
    losses = fr.rcnn_loss(
        out, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes, key, cfg, ext
    )
    assert np.isfinite(float(losses["total"]))
    assert 0.2 < float(losses["rpn_objectness"]) < 2.0


@pytest.mark.parametrize("box_rep,dim", [("box_4c", 10), ("box_8c", 24)])
def test_rcnn_corner_box_reps(setup, box_rep, dim):
    """MV3D-fidelity stage-2 regression: the corner representations wire
    into the rcnn family (head dim, finite decode, finite loss with grads
    through the box head)."""

    import dataclasses

    cfg, ext, model, inputs, batch, params = setup
    cfgc = dataclasses.replace(
        cfg, avod=dataclasses.replace(cfg.avod, box_rep=box_rep)
    )
    modelc = fr.FusionRcnn(cfg=cfgc, extents=ext)
    key = jax.random.PRNGKey(7)
    paramsc = modelc.init({"params": key, "dropout": key}, inputs, train=False)
    out = modelc.apply(paramsc, inputs, train=False)
    p = cfgc.rpn.eval_nms_size
    assert out["box_offsets"].shape == (2, p, dim)

    plane = batch.ground_plane  # [2, 4]
    det = fr.decode_rcnn_detections(out, cfgc, ext, ground_plane=plane)
    assert det["boxes_3d"].shape == (2, 1, cfgc.avod.nms_size, 7)
    finite = np.asarray(jnp.isfinite(det["boxes_3d"]))[np.asarray(det["valid"])]
    assert finite.all()

    def loss_fn(pp):
        o = modelc.apply(pp, inputs, train=True, rngs={"dropout": key})
        return fr.rcnn_loss(
            o, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes,
            key, cfgc, ext, ground_plane=plane,
        )["total"]

    val = float(loss_fn(paramsc))
    assert np.isfinite(val)
    grads = jax.grad(loss_fn)(paramsc)
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_rcnn_offsets_requires_no_plane(setup):
    """The historical offsets path keeps its plane-free signature."""

    cfg, ext, model, inputs, batch, params = setup
    out = model.apply(params, inputs, train=False)
    det = fr.decode_rcnn_detections(out, cfg, ext)
    assert det["boxes_3d"].shape == (2, 1, cfg.avod.nms_size, 7)


def test_rcnn_explicit_flip_head(setup):
    """explicit_flip_head on the rcnn family: logits emitted, CE term in
    the loss, decode flips the angle-vector heading by exactly pi."""

    import dataclasses

    cfg, ext, model, inputs, batch, params = setup
    cfgf = dataclasses.replace(
        cfg, avod=dataclasses.replace(cfg.avod, explicit_flip_head=True)
    )
    modelf = fr.FusionRcnn(cfg=cfgf, extents=ext)
    key = jax.random.PRNGKey(5)
    paramsf = modelf.init({"params": key, "dropout": key}, inputs, train=False)
    out = modelf.apply(paramsf, inputs, train=False)
    p = cfgf.rpn.eval_nms_size
    assert out["flip_logits"].shape == (2, p, 2)

    losses = fr.rcnn_loss(
        out, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes, key, cfgf, ext
    )
    assert "flip" in losses and np.isfinite(float(losses["flip"]))

    out0 = dict(out)
    out0["flip_logits"] = jnp.tile(jnp.array([[[5.0, -5.0]]]), (2, p, 1))
    out1 = dict(out)
    out1["flip_logits"] = jnp.tile(jnp.array([[[-5.0, 5.0]]]), (2, p, 1))
    det0 = fr.decode_rcnn_detections(out0, cfgf, ext)
    det1 = fr.decode_rcnn_detections(out1, cfgf, ext)
    np.testing.assert_allclose(
        np.asarray(det0["boxes_3d"][..., :6]),
        np.asarray(det1["boxes_3d"][..., :6]), atol=1e-6,
    )
    d = np.mod(
        np.asarray(det1["boxes_3d"][..., 6] - det0["boxes_3d"][..., 6]) + np.pi,
        2 * np.pi,
    ) - np.pi
    np.testing.assert_allclose(np.abs(d), np.pi, atol=1e-5)


def test_grads_flow(setup):
    cfg, ext, model, inputs, batch, params = setup
    key = jax.random.PRNGKey(2)

    def loss_fn(p):
        out = model.apply(p, inputs, train=True, rngs={"dropout": key})
        return fr.rcnn_loss(
            out, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes, key, cfg, ext
        )["total"]

    grads = jax.grad(loss_fn)(params)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads)))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_rcnn_trainer_evaluator_end_to_end(tmp_path):
    """The FULL rcnn dispatch path (architecture='rcnn' -> make_model ->
    Trainer -> orbax -> Evaluator -> KITTI txt -> AP) at unittest scale —
    the production path cars_check --preset rcnn_cars exercises on TPU."""

    import dataclasses

    from sparse_pooling_tpu.configs import unittest_config
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    root = tmp_path / "kitti"
    synthetic.write_kitti_tree(
        str(root), num_frames=3, n_ground=2048, n_obj=128, val_frames=(2,)
    )
    base = unittest_config(dataset_root=str(root))
    cfg = dataclasses.replace(
        base,
        checkpoint_name="rcnn_unittest",
        experiments_dir=str(tmp_path / "exp"),
        model=dataclasses.replace(base.model, architecture="rcnn"),
    )
    state = Trainer(cfg).train(max_steps=2)
    assert state.step == 2

    eval_cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split="val")
    )
    res = Evaluator(eval_cfg).run_checkpoint_once(2)
    assert res["frames_per_sec"] > 0
    ap = res["ap"]["Car"]["3d"]["moderate"]
    assert 0.0 <= ap <= 1.0
