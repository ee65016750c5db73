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
import signal
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
        (implementation shared with :class:`PreemptionCheckpoint`)

        Migration: checkpoints written before ``TrainState`` gained the
        ``extra_vars`` field (mutable BatchNorm stats) lack that subtree;
        they restore through a legacy template and keep the trainer's
        current (e.g. pretrained-import) batch stats.
        """
        state = trainer.state
        copy = lambda t: jax.tree.map(
            lambda x: x.copy() if hasattr(x, "copy") else x, t)
        ema_wanted = getattr(trainer, "ema_decay", None) is not None
        fresh_ema = (lambda params: copy(params) if ema_wanted else None)

        # template ladder: exact state; EMA-mismatch variants (a checkpoint
        # written without EMA restored into an EMA Trainer, or vice versa —
        # the shadow is params-shaped, so both directions are recoverable);
        # finally the pre-extra_vars legacy dict
        try:
            restored = self.manager.restore_latest(state)
            if restored is None:
                return False
            trainer.state = restored
            return True
        except Exception:
            pass
        for template_ema in (None, copy(state.params)):
            try:
                restored = self.manager.restore_latest(
                    state.replace(ema_params=template_ema))
            except Exception:
                continue
            if restored is None:
                return False
            ema = restored.ema_params
            if ema_wanted and ema is None:
                ema = fresh_ema(restored.params)  # checkpoint predates EMA
            elif not ema_wanted:
                ema = None  # drop a shadow this Trainer won't maintain
            trainer.state = restored.replace(ema_params=ema)
            return True
        legacy = {"params": state.params, "opt_state": state.opt_state,
                  "rng": state.rng, "step": state.step}
        restored_legacy = self.manager.restore_latest(legacy)
        if restored_legacy is None:
            return False
        params = restored_legacy["params"]
        trainer.state = type(state)(
            params=params,
            extra_vars=state.extra_vars,
            opt_state=restored_legacy["opt_state"],
            rng=restored_legacy["rng"],
            step=restored_legacy["step"],
            ema_params=fresh_ema(params),
        )
        return True


class PreemptionCheckpoint(CheckpointCallback):
    """Preemption-safe checkpointing: save on SIGTERM and stop cleanly.

    TPU VMs receive SIGTERM ahead of maintenance events and spot/preemptible
    reclaims. This callback installs a handler for the duration of
    ``Trainer.fit`` that, at the NEXT batch boundary after the signal
    lands (never mid-XLA-dispatch, never from inside the signal handler —
    async checkpointing from signal context is unsafe), force-saves the
    full train state (params + optimizer + PRNG + step), blocks until the
    write is durable, and sets ``trainer.stop_training`` so ``fit`` returns
    normally. Restart the same program and :meth:`restore_into` resumes
    from the exact step.

    Also supports a mid-epoch cadence (``save_every_steps``) so long epochs
    don't regress to epoch-boundary granularity — saves stay async on that
    path; only the preemption save blocks.

    The previous handler is restored on ``on_train_end``, so process
    managers keep their own SIGTERM behavior outside ``fit``.
    """

    def __init__(self, directory: str, trainer, max_to_keep: int = 3,
                 save_every_steps: Optional[int] = None,
                 signals=(signal.SIGTERM,)):
        super().__init__(directory, trainer, max_to_keep=max_to_keep)
        self.save_every_steps = save_every_steps
        self.signals = tuple(signals)
        self._received: Optional[int] = None
        self._previous: dict = {}
        self._preempted = False
        self._host_step = 0

    # -- signal plumbing ----------------------------------------------------
    def _handler(self, signum, frame):
        # only record the fact; all real work happens at a batch boundary
        self._received = signum

    def on_train_begin(self, logs=None):
        self._received = None
        self._preempted = False
        # one sync here is fine; per-batch reads below use this host-side
        # mirror so attaching the callback never stalls async dispatch
        self._host_step = int(self.trainer.state.step)
        self._previous = {
            s: signal.signal(s, self._handler) for s in self.signals
        }

    def on_train_end(self, logs=None):
        for s, prev in self._previous.items():
            signal.signal(s, prev if callable(prev) or prev in (
                signal.SIG_IGN, signal.SIG_DFL) else signal.SIG_DFL)
        self._previous = {}
        super().on_train_end(logs)

    # -- checkpoint cadence -------------------------------------------------
    def on_train_batch_end(self, batch, logs=None):
        # host-side step mirror: int(state.step) here would force a
        # device->host sync EVERY batch (state.step is the async-dispatched
        # step's output), serializing dispatch with execution
        self._host_step += 1
        step = self._host_step
        if self._received is not None:
            step = int(self.trainer.state.step)  # authoritative for the save
            self.manager.save(step, self.trainer.state, force=True)
            self.manager.wait()  # durable before we let the process die
            self.trainer.stop_training = True
            self._preempted = True
            print(f"PreemptionCheckpoint: signal "
                  f"{signal.Signals(self._received).name} -> saved step "
                  f"{step}, stopping")
            self._received = None
        elif self.save_every_steps and step and step % self.save_every_steps == 0:
            self.manager.save(int(self.trainer.state.step),
                              self.trainer.state)

    @property
    def preempted(self) -> bool:
        """Whether a monitored signal arrived (and triggered the save) —
        NOT merely that training stopped (EarlyStopping/TerminateOnNaN also
        set ``stop_training``)."""
        return self._preempted
