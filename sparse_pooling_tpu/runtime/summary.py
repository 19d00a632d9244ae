"""Scalar summary logging.

Capability parity with ``avod/core/summary_utils.py`` (TensorBoard scalars
for every loss term + LR). TensorBoard's writer is not guaranteed in this
environment, so scalars go to a JSONL stream that TB-compatible tooling (or
the bundled ``demos/plot_summaries.py``) can read; if ``tensorboardX`` or
``torch.utils.tensorboard`` is importable, events are mirrored there too.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._path = os.path.join(logdir, "scalars.jsonl")
        self._tb = None
        try:  # optional TensorBoard mirror
            from torch.utils.tensorboard import SummaryWriter as TbWriter

            self._tb = TbWriter(logdir)
        except Exception:
            self._tb = None

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": step, "time": time.time(), **{k: float(v) for k, v in values.items()}}
        with open(self._path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)

    def image(self, step: int, tag: str, image_hwc):
        """Save a prediction-visualization image (reference: image summaries
        with drawn boxes). PNG on disk + TB mirror when available."""

        import numpy as np
        from PIL import Image

        img_dir = os.path.join(os.path.dirname(self._path), "images")
        os.makedirs(img_dir, exist_ok=True)
        arr = np.asarray(image_hwc, dtype="uint8")
        Image.fromarray(arr).save(
            os.path.join(img_dir, f"{tag.replace('/', '_')}_{step:08d}.png")
        )
        if self._tb is not None:
            self._tb.add_image(tag, arr, step, dataformats="HWC")

    def close(self):
        if self._tb is not None:
            self._tb.close()


def read_scalars(logdir: str):
    path = os.path.join(logdir, "scalars.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]
