"""Orbax-based checkpointing with resume.

SURVEY.md §5.3/§5.4: the reference has no preemption handling — per-epoch
``.h5`` weight files via Keras callbacks are its whole story. The TPU-native
equivalent is Orbax: async array checkpoints of the full train state (params
+ optimizer state + step + PRNG key) with retention management and
restore-on-start, which is the right-sized elastic-recovery mechanism at this
scale (checkpoint-resume rather than a failure-detection layer).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager``.

    Saves arbitrary pytrees (typically a Trainer's ``state``) keyed by step;
    ``restore_latest`` implements restore-on-start.

    Example::

        ckpt = CheckpointManager("experiments/run1/ckpt", max_to_keep=3)
        state = ckpt.restore_latest(trainer.state) or trainer.state
        ...
        ckpt.save(step, trainer.state)
        ckpt.wait()  # block on async writes before exit
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
        )
        self._manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        """Async-save ``state`` at ``step`` (returns whether a save started)."""
        return self._manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, step: int, target: Any) -> Any:
        """Restore the checkpoint at ``step`` into ``target``'s structure."""
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(target)
        )

    def restore_latest(self, target: Any) -> Optional[Any]:
        """Restore the newest checkpoint, or None if none exist."""
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, target)

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def all_steps(self):
        return list(self._manager.all_steps())

    def wait(self):
        """Block until pending async saves complete."""
        self._manager.wait_until_finished()

    def close(self):
        self._manager.close()


from chambers_tpu.callbacks import Callback


class CheckpointCallback(Callback):
    """Trainer callback: Orbax-checkpoint the full train state every epoch.

    Unlike :class:`chambers_tpu.callbacks.ModelCheckpoint` (weights-only
    msgpack files, reference parity), this captures optimizer state and PRNG
    so training resumes exactly.
    """

    def __init__(self, directory: str, trainer, max_to_keep: int = 3):
        self.manager = CheckpointManager(directory, max_to_keep=max_to_keep)
        self.trainer = trainer

    def on_epoch_end(self, epoch, logs=None):
        self.manager.save(int(self.trainer.state.step), self.trainer.state)

    def on_train_end(self, logs=None):
        step = int(self.trainer.state.step)
        if self.manager.latest_step() != step:
            self.manager.save(step, self.trainer.state, force=True)
        self.manager.wait()

    def restore_into(self, trainer) -> bool:
        """Restore-on-start: load the latest state into ``trainer``.

        Migration: checkpoints written before ``TrainState`` gained the
        ``extra_vars`` field (mutable BatchNorm stats) lack that subtree;
        they restore through a legacy template and keep the trainer's
        current (e.g. pretrained-import) batch stats.
        """
        try:
            restored = self.manager.restore_latest(trainer.state)
        except Exception:
            state = trainer.state
            legacy = {"params": state.params, "opt_state": state.opt_state,
                      "rng": state.rng, "step": state.step}
            restored_legacy = self.manager.restore_latest(legacy)
            if restored_legacy is None:
                return False
            trainer.state = type(state)(
                params=restored_legacy["params"],
                extra_vars=state.extra_vars,
                opt_state=restored_legacy["opt_state"],
                rng=restored_legacy["rng"],
                step=restored_legacy["step"],
            )
            return True
        if restored is None:
            return False
        trainer.state = restored
        return True
