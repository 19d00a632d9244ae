"""Guards for the driver-facing files: bench.py and __graft_entry__.py.

These run on the real chip via the driver; here we guard the parts that can
break under refactoring without needing a TPU: imports, synthetic-input
construction, and the tiny-config equivalents of entry()'s graph pieces.
(dryrun_multichip is exercised directly by the driver on a virtual mesh.)
"""

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def test_synthetic_raw_shapes():
    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, unittest_config

    cfg = unittest_config().model
    raw = _synthetic_raw(cfg, AreaExtents(), n_points=256, seed=3)
    assert raw.points.shape == (cfg.sparse_pool.max_points, 3)
    assert raw.image.shape == (cfg.image.height, cfg.image.width, 3)
    assert raw.image.dtype == jnp.uint8
    assert int(raw.points_mask.sum()) == 256
    assert bool(raw.gt_valid.any())
    # points land inside the area extents
    pts = np.asarray(raw.points)[np.asarray(raw.points_mask)]
    assert (pts[:, 2] > 0).all() and (np.abs(pts[:, 0]) <= 40).all()


def test_bench_and_entry_import():
    import bench  # noqa: F401
    import __graft_entry__  # noqa: F401

    assert callable(bench.main)
    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)


def test_entry_graph_pieces_tiny():
    """entry()'s graph (init -> forward -> decode) on the tiny config."""

    import jax

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, unittest_config
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.models.detector import decode_detections_single

    cfg = unittest_config().model
    ext = AreaExtents()
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))
    raw = _synthetic_raw(cfg, ext, n_points=256)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key},
        pl.build_model_inputs(raw, anchors_static, jnp.ones((2,)), cfg, ext),
        train=False,
    )
    out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, False)
    det = decode_detections_single(out, raw.ground_plane, cfg, ext)
    assert det["boxes_3d"].shape[0] == cfg.num_classes
