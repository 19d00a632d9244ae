"""Runtime smoke tests: trainer loop, checkpoint resume, evaluator sweep,
prediction writer, CLIs — on the hermetic unittest config + synthetic tree.
"""

import glob
import json
import os

import numpy as np
import pytest

from sparse_pooling_tpu.configs import unittest_config
from sparse_pooling_tpu.configs.config import PipelineConfig
import dataclasses


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    from sparse_pooling_tpu.data import synthetic

    root = tmp_path_factory.mktemp("kitti_rt")
    synthetic.write_kitti_tree(str(root), num_frames=3, n_ground=2048, n_obj=128, val_frames=(2,))
    c = unittest_config(dataset_root=str(root))
    exp = tmp_path_factory.mktemp("experiments")
    return dataclasses.replace(c, experiments_dir=str(exp))


def test_dataset_loading(cfg):
    from sparse_pooling_tpu.data.dataset import KittiDataset

    ds = KittiDataset(cfg.dataset, cfg.model)
    assert len(ds) == 2  # train split
    s = ds.load_sample(ds.sample_ids[0])
    assert s.points.shape == (cfg.model.sparse_pool.max_points, 3)
    assert s.image.shape == (cfg.model.image.height, cfg.model.image.width, 3)
    assert s.points_mask.any()
    assert s.gt_valid.any()
    # augmentation determinism: same seed -> identical sample
    a = ds.load_sample(ds.sample_ids[0], augment_seed=7)
    b = ds.load_sample(ds.sample_ids[0], augment_seed=7)
    np.testing.assert_array_equal(a.points, b.points)
    np.testing.assert_array_equal(a.image, b.image)


def test_dataset_batches(cfg):
    from sparse_pooling_tpu.data.dataset import KittiDataset

    ds = KittiDataset(cfg.dataset, cfg.model)
    batches = list(ds.batches(2, epoch=0, augment=False))
    assert len(batches) == 1
    arrays, ids = batches[0]
    assert len(ids) == 2
    assert arrays[0].shape[0] == 2


def test_trainer_two_steps_and_resume(cfg):
    from sparse_pooling_tpu.runtime import checkpoint as ckpt_mod
    from sparse_pooling_tpu.runtime.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.train(max_steps=2)
    assert state.step == 2
    steps = ckpt_mod.all_steps(trainer.ckpt_dir)
    assert 1 in steps and 2 in steps  # checkpoint_interval=1 in unittest cfg

    # resume: a fresh trainer continues from step 2
    trainer2 = Trainer(cfg)
    state2 = trainer2.train(max_steps=3)
    assert state2.step == 3

    # summaries written
    scalars_path = os.path.join(trainer.workdir, "summaries", "scalars.jsonl")
    assert os.path.exists(scalars_path)


def test_evaluator_sweep(cfg):
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    eval_cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split="val")
    )
    ev = Evaluator(eval_cfg)
    results = ev.repeated_checkpoint_run(max_wait=0)
    assert len(results) >= 1
    r = results[-1]
    assert r["num_frames"] == 1
    assert "Car" in r["ap"]
    # AOS rides next to 2d/bev/3d in every eval result (round-4 metric)
    for cls_metrics in r["ap"].values():
        assert set(("2d", "bev", "3d", "aos")) <= set(cls_metrics)
        for diffs in cls_metrics.values():
            assert set(diffs) == {"easy", "moderate", "hard"}
    # which AP backend scored this sweep is recorded (never silent)
    assert r["ap_backend"] in ("native_cpp", "numpy_oracle")
    # KITTI txt written
    pred_files = glob.glob(
        os.path.join(ev.workdir, "predictions", "kitti_native_eval", "*", "*", "data", "*.txt")
    )
    assert pred_files
    # idempotent: second sweep does nothing
    assert ev.repeated_checkpoint_run(max_wait=0) == []


def test_evaluator_saves_rpn_proposals(cfg, tmp_path):
    """eval.save_rpn_proposals dumps per-frame proposals_and_scores txt
    (reference evaluator writes BOTH proposals and final detections):
    one row per valid proposal, 7 cols = anchor form [x y z dx dy dz] +
    objectness score, scores in the RPN's descending top-k order."""

    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    c = dataclasses.replace(
        cfg,
        experiments_dir=str(tmp_path),
        dataset=dataclasses.replace(cfg.dataset, split="val"),
        eval=dataclasses.replace(cfg.eval, save_rpn_proposals=True),
    )
    ev = Evaluator(c)
    params = ev._params_template()
    r = ev.run_checkpoint_once(step=0, params=params)
    assert r["num_frames"] == 1
    prop_files = glob.glob(
        os.path.join(ev.workdir, "predictions", "proposals_and_scores",
                     "0", "*.txt")
    )
    assert len(prop_files) == 1
    rows = np.loadtxt(prop_files[0], ndmin=2)
    assert rows.shape[1] == 7 and rows.shape[0] >= 1
    assert (rows[:, 3:6] > 0).all()  # positive box dims
    scores = rows[:, 6]
    assert (scores[:-1] >= scores[1:]).all()  # top-k order
    # detections still written alongside
    assert glob.glob(
        os.path.join(ev.workdir, "predictions", "kitti_native_eval",
                     "*", "0", "data", "*.txt")
    )


def test_evaluator_grouped_readback_parity(cfg, tmp_path):
    """Grouped device->host readback (readback_group stacking N batches
    into one transfer) must be byte-identical to per-batch readback across
    full groups AND the ragged tail."""

    import hashlib

    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    def run(group, exp_dir, async_writer=True):
        c = dataclasses.replace(
            cfg,
            experiments_dir=str(exp_dir),
            dataset=dataclasses.replace(cfg.dataset, split="trainval"),
            eval=dataclasses.replace(
                cfg.eval, batch_size=1, readback_group=group,
                inflight_batches=1, async_writer=async_writer,
            ),
        )
        ev = Evaluator(c)
        params = ev._params_template()
        r = ev.run_checkpoint_once(step=0, params=params)
        txts = sorted(
            glob.glob(os.path.join(ev.workdir, "predictions", "**", "*.txt"),
                      recursive=True)
        )
        h = hashlib.sha256(
            b"".join(open(t, "rb").read() for t in txts)
        ).hexdigest()
        return r, len(txts), h

    # 3 frames at batch 1: group=2 -> one full group + tail of 1
    r2, n2, h2 = run(2, tmp_path / "g2")
    r1, n1, h1 = run(1, tmp_path / "g1")
    # inline (synchronous) drain must match the writer-thread path too
    r0, n0, h0 = run(2, tmp_path / "g2sync", async_writer=False)
    assert r2["num_frames"] == r1["num_frames"] == r0["num_frames"] == 3
    assert n2 == n1 == n0 == 3
    assert h2 == h1 == h0
    assert r2["ap"] == r1["ap"] == r0["ap"]


def test_evaluator_packed_eval_fn_matches_dict(cfg):
    """The sweep-loop packed [B,C,K,9] result must unpack to exactly the
    dict-form detections (the packing exists only to make the device->host
    readback a single transfer)."""

    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    ev = Evaluator(cfg)
    params = ev._params_template()
    arrays, _ = next(ev.dataset.batches(2, 0, augment=False))
    batch = pl.RawSample(*(jnp.array(a) for a in arrays))
    want = ev._make_eval_fn()(params, batch)
    got = Evaluator._unpack_det(np.asarray(ev._make_eval_fn(packed=True)(params, batch)))
    assert sorted(got) == sorted(want)
    np.testing.assert_allclose(got["boxes_3d"], np.asarray(want["boxes_3d"]), rtol=1e-6)
    np.testing.assert_allclose(got["scores"], np.asarray(want["scores"]), rtol=1e-6)
    np.testing.assert_array_equal(got["valid"], np.asarray(want["valid"]))


def test_prediction_writer_round_trip(tmp_path):
    from sparse_pooling_tpu.data.labels import read_labels
    from sparse_pooling_tpu.runtime import predictions as pred_mod

    det = {
        "boxes_3d": np.array([[[1.0, 1.65, 20.0, 3.9, 1.6, 1.5, 0.3]]]),
        "scores": np.array([[0.9]]),
        "valid": np.array([[True]]),
    }
    p2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1.0, 0]])
    pred_mod.write_predictions(
        str(tmp_path), "000000", det, ["Car"], p2, (375, 1242), 0.1
    )
    rows = read_labels(str(tmp_path / "000000.txt"))
    assert len(rows) == 1
    ob = rows[0]
    assert ob.type == "Car"
    np.testing.assert_allclose(ob.t, (1.0, 1.65, 20.0), atol=1e-5)
    np.testing.assert_allclose(ob.score, 0.9, atol=1e-6)
    assert 0 <= ob.x1 < ob.x2 <= 1241


def test_kitti_rows_numpy_corners_parity():
    """The device-free writer's numpy corner twin must match the jnp op,
    and the vectorized row path must preserve per-box filter semantics."""

    from sparse_pooling_tpu.ops import encoders
    from sparse_pooling_tpu.runtime import predictions as pred_mod

    rng = np.random.RandomState(3)
    boxes = np.stack(
        [
            rng.uniform(-20, 20, 64),  # x
            rng.uniform(0.5, 2.5, 64),  # y
            rng.uniform(2, 60, 64),  # z
            rng.uniform(0.5, 4.5, 64),  # l
            rng.uniform(0.4, 2.0, 64),  # w
            rng.uniform(0.8, 2.0, 64),  # h
            rng.uniform(-np.pi, np.pi, 64),  # ry
        ],
        axis=1,
    )
    got = pred_mod._box_3d_to_corners_np(boxes)
    want = np.asarray(encoders.box_3d_to_corners(boxes))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # rows: include behind-camera (z<0 -> nonfinite uv) and low-score boxes
    boxes[0, 2] = -5.0
    det = {
        "boxes_3d": boxes[None],
        "scores": np.linspace(0, 1, 64)[None],
        "valid": np.ones((1, 64), bool),
    }
    p2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1.0, 0]])
    rows = pred_mod.detections_to_kitti_rows(det, ["Car"], p2, (375, 1242), 0.5)
    assert 0 < len(rows) <= 32  # score filter applied
    for r in rows:
        f = r.split()
        assert f[0] == "Car" and float(f[-1]) >= 0.5
        x1, y1, x2, y2 = map(float, f[4:8])
        assert 0 <= x1 < x2 <= 1241 and 0 <= y1 < y2 <= 374
        assert float(f[13]) > 0  # z in front of the camera


def test_native_pred_format_byte_parity(tmp_path):
    """The C formatter must produce byte-identical txt content to the
    Python %.6f path (both are correctly-rounded), including edge values
    (negatives, tiny, huge-but-in-range, multiple classes, empty file)."""

    from sparse_pooling_tpu.native import pred_format
    from sparse_pooling_tpu.runtime import predictions as pred_mod

    if not pred_format.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.RandomState(7)
    n = 257
    num = rng.uniform(-100, 1500, (n, 13))
    num[0] = [0.0, -0.0, 1e-7, 1241.0, 374.999999, 0.5, 0.5, 0.5,
              -39.9999995, 1.5, 69.999999, -3.14159265, 1.0]
    cls = rng.randint(0, 3, n).astype(np.int32)
    names = ["Car", "Pedestrian", "Cyclist"]

    got = pred_format.format_rows(num, cls, names)
    fmt = " ".join(["%.6f"] * 13)
    want = "".join(
        f"{names[c]} -1 -1 " + fmt % tuple(r) + "\n"
        for c, r in zip(cls, num)
    ).encode()
    assert got == want

    assert pred_format.format_rows(
        np.zeros((0, 13)), np.zeros((0,), np.int32), names
    ) == b""

    # and through the writer: file content identical to the row API
    det = {
        "boxes_3d": np.array([[[1.0, 1.65, 20.0, 3.9, 1.6, 1.5, 0.3],
                               [-2.0, 1.5, 8.0, 0.8, 0.6, 1.7, -1.2]]]),
        "scores": np.array([[0.9, 0.4]]),
        "valid": np.array([[True, True]]),
    }
    p2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1.0, 0]])
    pred_mod.write_predictions(
        str(tmp_path), "000001", det, ["Car"], p2, (375, 1242), 0.1
    )
    rows = pred_mod.detections_to_kitti_rows(
        det, ["Car"], p2, (375, 1242), 0.1
    )
    content = (tmp_path / "000001.txt").read_bytes()
    assert content == ("\n".join(rows) + "\n").encode()


def test_training_cli(cfg, tmp_path):
    import json as _json

    from sparse_pooling_tpu.experiments import run_training

    cfg_path = tmp_path / "cfg.json"
    cfg2 = dataclasses.replace(cfg, checkpoint_name="cli_test")
    cfg_path.write_text(cfg2.to_json())
    run_training.main(["--pipeline_config", str(cfg_path), "--max_steps", "1"])
    assert os.path.isdir(os.path.join(cfg.experiments_dir, "cli_test", "checkpoints"))


def test_label_clustering(cfg):
    from sparse_pooling_tpu.data.dataset import KittiDataset
    from sparse_pooling_tpu.runtime import preprocess

    ds = KittiDataset(cfg.dataset, cfg.model)
    clusters = preprocess.cluster_dataset_labels(ds, num_clusters=1)
    assert "Car" in clusters
    (l, w, h), = clusters["Car"]
    assert 3.0 < l < 5.0 and 1.3 < w < 2.0 and 1.2 < h < 2.0


def test_gen_mini_batches(cfg, tmp_path):
    import numpy as np

    from sparse_pooling_tpu.data.dataset import KittiDataset
    from sparse_pooling_tpu.runtime import preprocess

    ds = KittiDataset(cfg.dataset, cfg.model)
    paths = preprocess.gen_mini_batches(ds, str(tmp_path / "mb"), num_workers=2)
    assert len(paths) == len(ds)
    data = np.load(paths[0])
    assert "anchor_indices" in data and "Car" in data
    assert data["Car"].shape[0] == data["anchor_indices"].shape[0]
    # some anchor overlaps a GT car
    assert data["Car"][:, 0].max() > 0.3


def test_inference_cli_and_demo_render(cfg, tmp_path):
    """SURVEY §4.3 stack end-to-end: train 1 step -> run_inference CLI
    writes KITTI txt (+ .npy) -> show_predictions renders overlay PNGs."""

    from sparse_pooling_tpu.demos import show_predictions
    from sparse_pooling_tpu.experiments import run_inference
    from sparse_pooling_tpu.runtime.trainer import Trainer

    Trainer(cfg).train(max_steps=1)
    out_dir = str(tmp_path / "inference")
    run_inference.main([
        "--preset", "unittest",
        "--dataset_root", cfg.dataset.root,
        "--experiments_dir", cfg.experiments_dir,
        "--data_split", "val",
        "--out_dir", out_dir,
        "--save_npy",
    ])
    txts = glob.glob(os.path.join(out_dir, "**", "*.txt"), recursive=True)
    assert txts, "inference CLI wrote no KITTI txt predictions"
    npys = glob.glob(os.path.join(out_dir, "**", "*.npy"), recursive=True)
    assert npys, "--save_npy wrote no arrays"

    vis_dir = str(tmp_path / "vis")
    show_predictions.main([
        "--dataset_root", cfg.dataset.root,
        "--pred_dir", os.path.dirname(txts[0]),
        "--out_dir", vis_dir,
        "--score_threshold", "0.0",
        "--draw_gt",
    ])
    pngs = glob.glob(os.path.join(vis_dir, "*.png"))
    assert pngs, "demo renderer wrote no images"
