"""On-chip Trainer.fit for BASELINE config 4 (metric learning).

Closes BASELINE.md's "Trainer loop overhead" row: before
``steps_per_execution``, ``Trainer.fit`` dispatched one jitted step per host
round trip, which on the relay-attached chip cost ~14 s/step against a
104 ms device-resident ``lax.scan`` step. With
``Trainer(steps_per_execution=N)`` the SAME public API runs N steps per
dispatch (one compiled scan over a stacked window), so a real ``fit`` user
gets scan-harness speed.

Setup mirrors bench.py's ``metric_learning`` config (ViT-S/16 embedder,
full bf16, MS miner/loss, AdamW) with one realism difference: batches are
HOST-resident uint8 images that fit transfers to the device every window —
the scan harness's device-resident fp32 input pays no transfer at all, so
this measures what a user actually gets, transfer included (uint8 on the
wire is the documented pipeline contract — ship bytes, normalize on
device; BASELINE.md "host pipeline" section).

RELAY CAVEAT (measured r5, BASELINE.md "relay ingest pathology"): on this
relay-attached chip, executing any sizable program permanently degrades the
process's host→device transfer rate from ~1.4 GB/s to ~45 MB/s (thread
pools, numpy-arg shipping, donation, and idling do not recover it), so the
``fit`` numbers here are INGEST-bound at ~855 ms per 38.5 MB batch — an
environment floor, not framework overhead. The final JSON line measures the
same ``Trainer.train_window`` on a device-resident window: that is the
Trainer's own per-step cost (matches the 104 ms scan harness), and what a
``fit`` user gets on co-located hardware where PCIe ingest is ~4 ms/batch.

Usage: python tools/bench_trainer_fit.py [SPE ...]
Prints one JSON line per configuration plus the resident-window line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
STEPS_PER_EPOCH = int(os.environ.get("BENCH_STEPS_PER_EPOCH", "24"))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", "3"))
N_HOST_BATCHES = 8


def build_trainer(spe):
    import jax.numpy as jnp

    from chambers_tpu.layers import l2_normalize
    from chambers_tpu.losses import MultiSimilarityLoss
    from chambers_tpu.models import Model
    from chambers_tpu.models.backbones.vision_transformer import (
        VisionTransformer,
    )
    from chambers_tpu.optimizers import AdamW
    from chambers_tpu.training import Trainer
    import jax

    vit = VisionTransformer(
        patch_size=16, patch_dim=384, n_encoder_layers=12, n_heads=6,
        ff_dim=1536, dropout_rate=0.0, include_top=False, pooling="cls",
        feature_dim=128, dtype=jnp.bfloat16, score_dtype=jnp.bfloat16,
    )
    variables = vit.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 224, 224, 3), jnp.float32))
    model = Model(vit, variables)
    ms_loss = MultiSimilarityLoss()

    def loss(y_true, y_pred):
        return ms_loss(y_true, l2_normalize(y_pred, axis=-1))

    return Trainer(
        model, loss=loss,
        optimizer=AdamW(weight_decay=1e-4, learning_rate=1e-3,
                        decay_exclude=["bias", "norm"]),
        steps_per_execution=spe,
    )


def host_batches():
    """Host-resident uint8 image batches + P×K-style labels."""
    rng = np.random.RandomState(0)
    data = []
    for i in range(N_HOST_BATCHES):
        x = rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8)
        y = np.arange(BATCH) % (BATCH // 4)
        data.append((x, y))
    return data


def bench_resident_window(trainer, data, spe):
    """Per-step time of the compiled window on a device-resident window —
    the Trainer's compute cost with the relay ingest floor excluded."""
    import jax

    window = [(x, y, None) for (x, y) in data[:spe]]
    placed = trainer._place_window(window)
    state = trainer.state
    ms = trainer._init_metric_states()
    state, ms, logs = trainer.train_window(state, ms, placed)  # warm
    float(logs["loss"][-1])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, ms, logs = trainer.train_window(state, ms, placed)
        float(logs["loss"][-1])  # sync
        times.append(time.perf_counter() - t0)
    per_step_ms = float(np.median(times)) / spe * 1e3
    print(json.dumps({
        "metric": "Trainer.train_window per-step time, device-resident "
                  f"window (config 4, batch {BATCH}, "
                  f"steps_per_execution={spe})",
        "value": round(per_step_ms, 1),
        "unit": "ms/step",
        "img_per_s": round(BATCH / (per_step_ms / 1e3), 1),
    }), flush=True)


def main():
    spes = [int(a) for a in sys.argv[1:]] or [8]
    data = host_batches()
    for spe in spes:
        trainer = build_trainer(spe)
        epoch_times = []

        t0 = time.perf_counter()
        history = trainer.fit(data, epochs=EPOCHS,
                              steps_per_epoch=STEPS_PER_EPOCH, verbose=False,
                              callbacks=[_EpochTimer(epoch_times)])
        total = time.perf_counter() - t0
        # epoch 1 pays compile; steady state = median of the rest
        steady = (np.median(epoch_times[1:]) if len(epoch_times) > 1
                  else epoch_times[0])
        per_step_ms = steady / STEPS_PER_EPOCH * 1e3
        print(json.dumps({
            "metric": "Trainer.fit per-step time (config 4: ViT-S/16 MS "
                      f"metric learning, batch {BATCH}, uint8 host batches, "
                      f"steps_per_execution={spe})",
            "value": round(per_step_ms, 1),
            "unit": "ms/step",
            "img_per_s": round(BATCH / (per_step_ms / 1e3), 1),
            "first_epoch_s": round(epoch_times[0], 1),
            "total_s": round(total, 1),
            "final_loss": round(history[-1]["loss"], 4),
        }), flush=True)
    # compute-side per-step (device-resident window) — see module docstring
    bench_resident_window(build_trainer(8), data, spe=8)


def _EpochTimer(sink):
    from chambers_tpu.callbacks import Callback

    class EpochTimer(Callback):
        def on_epoch_begin(self, epoch, logs=None):
            self._t0 = time.perf_counter()

        def on_epoch_end(self, epoch, logs=None):
            sink.append(time.perf_counter() - self._t0)

    return EpochTimer()


if __name__ == "__main__":
    main()
