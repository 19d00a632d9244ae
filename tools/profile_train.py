"""Backward-pass stage-cost table for the flagship detector (TPU).

The inference table (tools/profile_stages.py) accounts for the forward
graph; this tool produces the TRAINING counterpart: per stage, the
forward-only time and the forward+backward (value_and_grad) time at
train-time shapes, plus the real end-to-end train step (inputs -> model ->
loss -> grads -> Adam) for the total the stages must explain.

Methodology identical to profile_stages.py (ROADMAP.md "measurement
discipline"): N iterations inside ONE jitted fori_loop, the readback scalar
depends on every gradient leaf, big arrays passed as jit args.

Usage:  python tools/profile_train.py [--batch 4] [--stages a,b,c]
Prints per stage: fwd ms/batch, fwd+bwd ms/batch, bwd-only estimate.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()
from profile_stages import build_stages, timed  # noqa: E402

# Stages whose outputs are not differentiable functions of float inputs
# (pure int selection / input building) — fwd-only rows.
NONDIFF = {"inputs", "rpn_nms", "final_nms"}


def gradded(body):
    """Wrap a stage body as value+grad w.r.t. every floating-point leaf."""

    import jax
    import jax.numpy as jnp

    def run(*a):
        leaves, treedef = jax.tree.flatten(a)
        is_f = [
            hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
            for l in leaves
        ]
        static = [None if f else l for l, f in zip(leaves, is_f)]

        def scalar_fn(diff):
            merged = [d if s is None else s for d, s in zip(diff, static)]
            out = body(*jax.tree.unflatten(treedef, merged))
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
            )

        diff = [l if f else None for l, f in zip(leaves, is_f)]
        return jax.value_and_grad(scalar_fn)(diff)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument(
        "--batches",
        default="",
        help="comma list, e.g. 4,8,16: time ONLY the full train step at each "
        "batch size and print a ms/step + frames/sec knee table (the training "
        "analog of bench.py --batch-sweep), then exit",
    )
    ap.add_argument(
        "--remat", action="store_true",
        help="rematerialize the conv encoder/decoder in the backward pass "
        "(backbone.remat=True): trades recompute FLOPs for activation HBM",
    )
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.runtime.trainer import build_optimizer, make_train_step

    b = args.batch
    pipe = cars_pyramid_config()
    if args.remat:
        pipe = dataclasses.replace(
            pipe,
            model=dataclasses.replace(
                pipe.model,
                backbone=dataclasses.replace(pipe.model.backbone, remat=True),
            ),
        )
    cfg = pipe.model
    ext = AreaExtents()
    key = jax.random.PRNGKey(0)

    # ---- real end-to-end train step (the number the stages must explain)
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))
    frames = [_synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(b)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    raw0 = jax.tree.map(lambda x: x[0], batch)
    inputs0 = pl.build_model_inputs(
        raw0, anchors_static, jnp.ones((2,), jnp.float32), cfg, ext
    )
    params = jax.jit(
        lambda k, i: model.init({"params": k, "dropout": k}, i, train=False)
    )(key, inputs0)
    tx = build_optimizer(pipe)
    opt_state = jax.jit(tx.init)(params)
    train_step = make_train_step(model, tx, anchors_static, pipe, ext)

    def loss_fn(params, batch, rng):
        r_fwd, r_loss = jax.random.split(rng)
        out = pl.forward_batch_fn(
            model, params, batch, anchors_static, cfg, ext, True, r_fwd
        )
        return pl.loss_batch(out, batch, r_loss, cfg, ext)["total"]

    if args.batches:
        # Training analog of the inference batch-size knee sweep: params and
        # optimizer state are batch-independent, only the stacked batch (and
        # the per-shape jit specialization) changes per point.
        print(f"{'batch':>5s} {'ms/step':>9s} {'frames/s':>9s}")
        for bs in [int(x) for x in args.batches.split(",") if x]:
            fr = [_synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(bs)]
            bt = jax.tree.map(lambda *xs: jnp.stack(xs), *fr)
            dt = timed(
                lambda p, o, b_: train_step(p, o, b_, key)[:2],
                (params, opt_state, bt),
                args.iters,
            )
            print(f"{bs:5d} {dt * 1e3:9.2f} {bs / dt:9.2f}")
        return

    rows = []
    if not args.skip_full:
        full = timed(
            lambda p, o, bt: train_step(p, o, bt, key)[:2],
            (params, opt_state, batch),
            args.iters,
        )
        rows.append(("full_train_step", None, full))
        fwd_loss = timed(
            lambda p, bt: loss_fn(p, bt, key), (params, batch), args.iters
        )
        fwd_bwd_loss = timed(
            gradded(lambda p, bt: loss_fn(p, bt, key)), (params, batch), args.iters
        )
        rows.append(("fwd_loss(e2e)", fwd_loss, None))
        rows.append(("fwd+bwd(e2e)", fwd_loss, fwd_bwd_loss))

    stages = build_stages(b, train=True)
    want = [w for w in args.stages.split(",") if w] or list(stages)
    for name in want:
        body, sargs = stages[name]
        fwd = timed(body, sargs, args.iters)
        if name in NONDIFF:
            rows.append((name, fwd, None))
        else:
            fb = timed(gradded(body), sargs, args.iters)
            rows.append((name, fwd, fb))

    print(f"{'stage':18s} {'fwd ms/b':>9s} {'fwd+bwd':>9s} {'bwd est':>9s}")
    for name, fwd, fb in rows:
        f = f"{fwd * 1e3:9.2f}" if fwd is not None else "        -"
        t = f"{fb * 1e3:9.2f}" if fb is not None else "        -"
        d = (
            f"{(fb - fwd) * 1e3:9.2f}"
            if fwd is not None and fb is not None
            else "        -"
        )
        print(f"{name:18s} {f} {t} {d}")


if __name__ == "__main__":
    main()
