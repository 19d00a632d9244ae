"""AOT serving export: serialize the compiled inference graph to disk.

The reference lineage deploys by freezing a TF1 inference graph (ckpt ->
frozen .pb) and serving it from C++/Python without the training code. The
TPU-native counterpart is ``jax.export``: the jitted batch forward + decode
is lowered to StableHLO once, the trained weights are baked in as
constants, and the resulting artifact is a single self-contained file that
any later process (same platform family) can deserialize and call — no
model code, no config parsing, no retrace, no Python-side weight loading.

    exp = export_inference(cfg, params, batch_size=8)      # trace + lower
    save_exported(exp, "cars_b8.shlo")
    ...
    fn = load_serving_fn("cars_b8.shlo")                   # any process
    dets = fn(raw_batch)        # dict: boxes_3d, scores, classes, valid

CLI: ``python -m sparse_pooling_tpu.experiments.export_model``.

The artifact is versioned by jax.export's calling-convention version; the
platform list is recorded at export time (default: the current backend)
and checked at call time.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from sparse_pooling_tpu.configs.config import AreaExtents, PipelineConfig
from sparse_pooling_tpu.data.dataset import MAX_GT_BOXES
from sparse_pooling_tpu.models import pipeline as pl


@functools.cache
def _register_raw_sample():
    jexport.register_namedtuple_serialization(
        pl.RawSample, serialized_name="sparse_pooling_tpu.RawSample"
    )


def serving_input_spec(
    cfg: PipelineConfig, batch_size: int, extents: AreaExtents = AreaExtents()
) -> pl.RawSample:
    """ShapeDtypeStruct pytree of one inference batch (gt fields unused by
    the forward pass but part of the RawSample layout contract)."""

    m = cfg.model
    p = m.sparse_pool.max_points
    h, w = m.image.height, m.image.width
    g = MAX_GT_BOXES

    def s(shape, dtype):
        return jax.ShapeDtypeStruct((batch_size,) + shape, dtype)

    return pl.RawSample(
        points=s((p, 3), jnp.float32),
        points_mask=s((p,), jnp.bool_),
        image=s((h, w, 3), jnp.uint8),
        p2=s((3, 4), jnp.float32),
        ground_plane=s((4,), jnp.float32),
        gt_boxes_3d=s((g, 7), jnp.float32),
        gt_valid=s((g,), jnp.bool_),
        gt_classes=s((g,), jnp.int32),
        image_scale=s((2,), jnp.float32),
    )


def export_inference(
    cfg: PipelineConfig,
    params,
    batch_size: int = 8,
    extents: AreaExtents = AreaExtents(),
    platforms: Optional[Sequence[str]] = None,
) -> jexport.Exported:
    """Lower the full inference pipeline (build inputs -> two-branch SHPL
    fusion detector -> decode + NMS) for ``batch_size`` frames, with
    ``params`` baked in as constants (self-contained artifact)."""

    _register_raw_sample()
    model = pl.make_model(cfg.model, extents)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg.model, extents))
    m, ext = cfg.model, extents
    # device params would serialize with sharding baggage; bake host copies
    params = jax.tree.map(np.asarray, params)

    @jax.jit
    def serve(batch: pl.RawSample):
        out = pl.forward_batch_fn(model, params, batch, anchors_static, m, ext, False)
        return pl.decode_batch(out, batch.ground_plane, m, ext)

    spec = serving_input_spec(cfg, batch_size, extents)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(serve, **kwargs)(spec)


def save_exported(exp: jexport.Exported, path: str) -> int:
    data = exp.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str) -> jexport.Exported:
    _register_raw_sample()
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def load_serving_fn(path: str):
    """Deserialize and return a callable(raw_batch) -> detection dict."""

    exp = load_exported(path)

    def fn(batch: pl.RawSample):
        return exp.call(batch)

    fn.exported = exp
    return fn
