"""Training runtime: optax optimizer, sharded train step, checkpoint loop.

Capability parity with the reference's ``avod/core/trainer.py`` +
``trainer_utils.py`` + ``avod/builders/optimizer_builder.py``: Adam with
exponential-decay LR from config, periodic scalar summaries, periodic
checkpoints with auto-resume from the latest one. TPU-first differences:
the whole step (voxelize -> sparse build -> model -> loss -> grads ->
update) is ONE jitted function, batch-sharded over the mesh's data axis
(SURVEY.md §3.9), with orbax checkpoints instead of tf.train.Saver.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from sparse_pooling_tpu.configs.config import AreaExtents, PipelineConfig
from sparse_pooling_tpu.data.dataset import KittiDataset
from sparse_pooling_tpu.data.prefetch import DevicePrefetcher
from sparse_pooling_tpu.models import loss as loss_mod
from sparse_pooling_tpu.models import pipeline as pl
from sparse_pooling_tpu.parallel import mesh as mesh_mod
from sparse_pooling_tpu.runtime import checkpoint as ckpt_mod
from sparse_pooling_tpu.runtime.summary import SummaryWriter


def build_optimizer(cfg: PipelineConfig) -> optax.GradientTransformation:
    """Adam/SGD/RMSprop + exponential decay (reference optimizer_builder)."""

    oc = cfg.train.optimizer
    schedule = optax.exponential_decay(
        init_value=oc.initial_lr,
        transition_steps=oc.decay_steps,
        decay_rate=oc.decay_rate,
        staircase=oc.staircase,
    )
    makers = {
        "adam": optax.adam,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
    }
    if oc.name not in makers:
        raise ValueError(f"unknown optimizer '{oc.name}'")
    tx = makers[oc.name](schedule)
    if oc.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(oc.grad_clip_norm), tx)
    return tx


def make_train_step(model, tx, anchors_static, cfg, extents):
    """One jitted, batch-vmapped, mesh-shardable training step."""

    mc = cfg.model

    def loss_fn(params, batch: pl.RawSample, rng):
        r_fwd, r_loss = jax.random.split(rng)
        out = pl.forward_batch_fn(
            model, params, batch, anchors_static, mc, extents, True, r_fwd
        )
        losses = pl.loss_batch(out, batch, r_loss, mc, extents)
        return losses["total"], losses

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int
    rng: Any


class Trainer:
    """Experiment-directory-owning train loop (reference trainer.train)."""

    def __init__(
        self,
        cfg: PipelineConfig,
        dataset: Optional[KittiDataset] = None,
        extents: AreaExtents = AreaExtents(),
        workdir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.extents = extents
        self.dataset = dataset or KittiDataset(cfg.dataset, cfg.model, extents)
        self.workdir = workdir or os.path.join(
            cfg.experiments_dir, cfg.checkpoint_name
        )
        self.ckpt_dir = os.path.join(self.workdir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(os.path.join(self.workdir, "pipeline_config.json"), "w") as f:
            f.write(cfg.to_json())

        self.model = pl.make_model(cfg.model, extents)
        self.anchors_static = jnp.array(pl.static_anchor_grid(cfg.model, extents))
        self.tx = build_optimizer(cfg)
        self.summary = SummaryWriter(os.path.join(self.workdir, "summaries"))

        # Production mesh (SURVEY.md §3.9): data-parallel batch sharding over
        # every visible device, optional tensor parallelism for the stage-2
        # FCs. None -> plain single-device execution.
        self.mesh = (
            mesh_mod.auto_mesh(cfg.train.batch_size, cfg.train.model_parallel)
            if cfg.train.data_parallel
            else None
        )
        if self.mesh is not None:
            shape = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
            print(f"[trainer] mesh {shape} over {self.mesh.devices.size} devices")

    # ------------------------------------------------------------ state
    def init_state(self, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        sample_batch = self._first_batch()
        raw0 = jax.tree.map(lambda x: x[0], sample_batch)

        # one jitted call, not eager flax init (op-by-op init dispatches
        # hundreds of tunneled device calls on the remote runtime — ~400 s
        # measured on the evaluator's identical template path)
        def init_fn(rng, raw):
            inputs = pl.build_model_inputs(
                raw, self.anchors_static, jnp.ones((2,), jnp.float32),
                self.cfg.model, self.extents,
            )
            return self.model.init(
                {"params": rng, "dropout": rng}, inputs, train=False
            )

        params = jax.jit(init_fn)(rng, raw0)
        if self.mesh is not None:
            # place params BEFORE tx.init so optimizer moments inherit the
            # same (replicated / TP-split) shardings via zeros_like
            params = mesh_mod.shard_params(params, self.mesh)
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            opt_state = mesh_mod.shard_opt_state(opt_state, self.mesh)
        return TrainState(params, opt_state, 0, rng)

    def _first_batch(self) -> pl.RawSample:
        arrays, _ = next(self.dataset.batches(self.cfg.train.batch_size, 0, augment=False))
        return pl.RawSample(*(jnp.array(a) for a in arrays))

    def restore_or_init(self) -> TrainState:
        state = self.init_state()
        latest = ckpt_mod.latest_step(self.ckpt_dir)
        if latest is not None:
            # the template carries the mesh shardings from init_state, so
            # orbax restores straight onto the sharded layout
            restored = ckpt_mod.restore(
                self.ckpt_dir, latest,
                {"params": state.params, "opt_state": state.opt_state},
            )
            state = TrainState(
                restored["params"], restored["opt_state"], latest, state.rng
            )
            print(f"[trainer] resumed from step {latest}")
        return state

    # ------------------------------------------------------------ loop
    def train(self, max_steps: Optional[int] = None) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps or cfg.train.max_iterations
        state = self.restore_or_init()
        train_step = make_train_step(
            self.model, self.tx, self.anchors_static, cfg, self.extents
        )

        bsz = cfg.train.batch_size
        step = state.step
        params, opt_state, rng = state.params, state.opt_state, state.rng
        t_last = time.time()
        epoch = step * bsz // max(len(self.dataset), 1)

        batch_sharding = (
            mesh_mod.batch_sharding(self.mesh) if self.mesh is not None else None
        )
        writer = ckpt_mod.CheckpointWriter(
            self.ckpt_dir, keep=cfg.train.max_checkpoints_to_keep
        )
        while step < max_steps:
            host_iter = self.dataset.batches(bsz, epoch, augment=True)
            prefetch = DevicePrefetcher(
                host_iter,
                depth=cfg.train.prefetch_depth,
                transform=lambda item: (pl.RawSample(*item[0]), item[1]),
                sharding=batch_sharding,
            )
            with prefetch:  # early break must release the worker + batches
                for batch, _ids in prefetch:
                    rng, step_rng = jax.random.split(rng)
                    params, opt_state, metrics = train_step(
                        params, opt_state, batch, step_rng
                    )
                    step += 1
                    if step % cfg.train.summary_interval == 0:
                        metrics = {k: float(v) for k, v in metrics.items()}
                        dt = time.time() - t_last
                        t_last = time.time()
                        rate = cfg.train.summary_interval * bsz / max(dt, 1e-9)
                        self.summary.scalars(
                            step, {**metrics, "frames_per_sec": rate}
                        )
                        print(
                            f"[trainer] step {step} total={metrics['total']:.4f} "
                            f"rpn_obj={metrics['rpn_objectness']:.4f} "
                            f"cls={metrics['cls']:.4f} fps={rate:.1f}"
                        )
                    if step % cfg.train.checkpoint_interval == 0 or step >= max_steps:
                        # async: serialization overlaps the next steps
                        writer.save(step, {"params": params, "opt_state": opt_state})
                    if step >= max_steps:
                        break
            epoch += 1

        writer.close()  # flush in-flight saves before handing state back
        return TrainState(params, opt_state, step, rng)
