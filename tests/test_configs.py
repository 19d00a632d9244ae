"""On-disk example configs (reference: ``avod/configs/*.config`` files).

The reference ships text-format pipeline configs loaded by
``config_builder_util.get_configs_from_pipeline_file``; the rebuild ships
``sparse_pooling_tpu/configs/examples/*.json`` loaded by
``configs.pipeline_config_from_file``. These tests pin (1) every shipped
file loads to EXACTLY its preset, (2) the CLI path consumes the files, and
(3) unknown keys still raise.
"""

import dataclasses
import json
import os

import pytest

from sparse_pooling_tpu.configs import presets
from sparse_pooling_tpu.configs.config import (
    pipeline_config_from_dict,
    pipeline_config_from_file,
)

EXAMPLES_DIR = os.path.join(
    os.path.dirname(presets.__file__), "examples"
)
PRESET_NAMES = ["cars", "rcnn_cars", "people", "unittest"]


@pytest.mark.parametrize("name", PRESET_NAMES)
def test_example_file_round_trips_to_preset(name):
    path = os.path.join(EXAMPLES_DIR, f"{name}.json")
    assert os.path.exists(path), f"missing shipped example config {path}"
    loaded = pipeline_config_from_file(path)
    assert loaded == presets.preset(name)


@pytest.mark.parametrize("name", PRESET_NAMES)
def test_example_file_is_regenerable(name):
    """The file content matches ``preset().to_json()`` so drift between the
    Python presets and the shipped files is caught here."""

    path = os.path.join(EXAMPLES_DIR, f"{name}.json")
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk == json.loads(presets.preset(name).to_json())


def test_cli_loads_example_file(tmp_path):
    from sparse_pooling_tpu.experiments.run_training import load_config, parse_args

    path = os.path.join(EXAMPLES_DIR, "unittest.json")
    args = parse_args(
        [f"--pipeline_config={path}", "--dataset_root", str(tmp_path)]
    )
    cfg = load_config(args)
    assert cfg.checkpoint_name == "unittest_pipeline"
    assert cfg.dataset.root == str(tmp_path)


def test_unknown_key_raises(tmp_path):
    cfg = presets.preset("unittest")
    data = json.loads(cfg.to_json())
    data["model"]["not_a_field"] = 1
    with pytest.raises(KeyError, match="not_a_field"):
        pipeline_config_from_dict(data)


def test_partial_dict_takes_defaults():
    cfg = pipeline_config_from_dict({"model": {"classes": ["Car", "Van"]}})
    assert cfg.model.classes == ("Car", "Van")
    assert cfg.train.batch_size == dataclasses.fields(type(cfg.train))[0].default
