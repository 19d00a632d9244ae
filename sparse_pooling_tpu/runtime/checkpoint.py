"""Checkpoint save/restore (orbax).

Capability parity with the reference's ``tf.train.Saver`` usage
(``trainer_utils``): save every checkpoint_interval steps with a large keep
count so the evaluator can sweep all of them; resume from latest on restart
(the reference's only fault-tolerance mechanism, SURVEY.md §6).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, keep: int = 10000) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save(ckpt_dir: str, step: int, state: Dict[str, Any], keep: int = 10000):
    """One-shot SYNCHRONOUS save (tools/tests). Training uses
    ``CheckpointWriter`` so the step loop never blocks on serialization."""

    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


class CheckpointWriter:
    """Async checkpoint writer for the train loop (SURVEY.md §6: 'Orbax
    async checkpoint').

    ``save`` snapshots the pytree and returns immediately — orbax's
    CheckpointManager serializes in a background thread while the next
    steps run (jax arrays are immutable and the train step does not donate
    params, so the snapshot stays valid). A save that is still in flight
    when the next one arrives is waited on by orbax internally; call
    ``wait``/``close`` before reading checkpoints back or exiting.
    """

    def __init__(self, ckpt_dir: str, keep: int = 10000):
        self._mgr = _manager(ckpt_dir, keep)

    def save(self, step: int, state: Dict[str, Any]):
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore(ckpt_dir: str, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
    mgr = _manager(ckpt_dir)
    out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return out


def restore_params(ckpt_dir: str, step: int, params_template, tx):
    """Restore just the params from a {params, opt_state} checkpoint.

    orbax's StandardRestore wants the full saved structure as template, so
    the optimizer state template is rebuilt from ``tx`` and discarded.
    """

    template = {"params": params_template, "opt_state": tx.init(params_template)}
    return restore(ckpt_dir, step, template)["params"]


def all_steps(ckpt_dir: str) -> List[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    mgr = _manager(ckpt_dir)
    steps = sorted(mgr.all_steps())
    mgr.close()
    return steps


def latest_step(ckpt_dir: str) -> Optional[int]:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None
