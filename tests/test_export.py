"""Serving-export round trip: serialize -> deserialize -> bit-match.

The export artifact (runtime/export.py) is the deployment contract: the
full inference pipeline lowered to StableHLO with weights baked in. These
tests pin (a) that the artifact reproduces the live jitted pipeline
exactly, (b) that it survives a disk round trip, and (c) that the input
spec matches the dataset's batch layout.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_pooling_tpu.configs import unittest_config
from sparse_pooling_tpu.configs.config import AreaExtents
from sparse_pooling_tpu.models import pipeline as pl
from sparse_pooling_tpu.runtime import export as export_mod
from sparse_pooling_tpu.runtime.evaluator import Evaluator


@pytest.fixture(scope="module")
def setup(kitti_root):
    cfg = unittest_config(dataset_root=kitti_root)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split="trainval")
    )
    ev = Evaluator(cfg)
    params = ev._params_template()
    arrays, _ = next(ev.dataset.batches(2, 0, augment=False))
    batch = pl.RawSample(*(jnp.array(a) for a in arrays))
    return cfg, ev, params, batch


def test_export_matches_live_pipeline(setup):
    cfg, ev, params, batch = setup
    exp = export_mod.export_inference(cfg, params, batch_size=2)
    got = exp.call(batch)
    want = ev._make_eval_fn()(params, batch)
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5
        )


def test_export_disk_round_trip(setup, tmp_path):
    cfg, ev, params, batch = setup
    exp = export_mod.export_inference(cfg, params, batch_size=2)
    path = str(tmp_path / "unittest_b2.shlo")
    n = export_mod.save_exported(exp, path)
    assert n > 1000
    fn = export_mod.load_serving_fn(path)
    got = fn(batch)
    want = exp.call(batch)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_input_spec_matches_dataset_layout(setup):
    cfg, ev, params, batch = setup
    spec = export_mod.serving_input_spec(cfg, batch_size=2)
    for name, s, a in zip(spec._fields, spec, batch):
        assert s.shape == a.shape, name
        assert s.dtype == a.dtype, name
