"""Train the Seq2Seq transformer on a synthetic sequence-reversal task.

Shows the encoder–decoder model family (reference models/transformer.py's
``Seq2SeqTransformer``) going through the Trainer: teacher-forced decoding
with causal masks, padding-aware cross entropy (token id 0 = padding,
matching the reference's ``mask_zero=True`` embeddings), and greedy decode
at the end. ``x`` batches are ``(input_tokens, target_in)`` tuples — the
Trainer passes any pytree ``x`` straight into the model.

    python examples/train_seq2seq.py
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.models import Seq2SeqTransformer
from chambers_tpu.models.model import Model
from chambers_tpu.optimizers import AdamW
from chambers_tpu.schedules import LinearWarmup
from chambers_tpu.training import Trainer

BOS = 1  # 0 is padding


def make_batches(vocab, seq_len, batch, steps, seed=0):
    """Reverse-the-sequence task with teacher forcing.

    x = (source, target_input); y = target_output (shifted by one).
    """
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        src = rng.randint(2, vocab, (batch, seq_len)).astype(np.int32)
        tgt = src[:, ::-1]
        tgt_in = np.concatenate(
            [np.full((batch, 1), BOS, np.int32), tgt[:, :-1]], axis=1)
        yield (src, tgt_in), tgt


def padded_cross_entropy(y_true, logits):
    """CE over non-padding target positions."""
    mask = (y_true != 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y_true[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def token_accuracy(y_true, logits):
    mask = y_true != 0
    hits = (jnp.argmax(logits, -1) == y_true) & mask
    return jnp.sum(hits) / jnp.maximum(jnp.sum(mask), 1)


def decode(model, src, max_len):
    """One compiled program for the whole autoregressive decode — the
    TPU-native replacement for a token-per-dispatch host loop."""
    from chambers_tpu.models import greedy_decode

    fn = jax.jit(lambda v, s: greedy_decode(
        model.module, v, s, max_len=max_len, bos_id=BOS))
    return np.asarray(fn(model.variables, jnp.asarray(src)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vocab", type=int, default=32)
    parser.add_argument("--seq-len", type=int, default=12)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--steps-per-epoch", type=int, default=50)
    args = parser.parse_args()

    module = Seq2SeqTransformer(
        input_vocab_size=args.vocab, output_vocab_size=args.vocab,
        embed_dim=64, num_heads=4, dim_feedforward=256,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.1,
    )
    dummy = (jnp.zeros((1, args.seq_len), jnp.int32),
             jnp.zeros((1, args.seq_len), jnp.int32))
    variables = module.init(jax.random.PRNGKey(0), dummy)
    model = Model(module, variables, name="seq2seq")

    trainer = Trainer(
        model,
        loss=padded_cross_entropy,
        optimizer=AdamW(weight_decay=1e-4,
                        learning_rate=LinearWarmup(3e-3, warmup_steps=30)),
        metrics={"token_acc": token_accuracy},
    )
    total = args.epochs * args.steps_per_epoch
    trainer.fit(
        make_batches(args.vocab, args.seq_len, args.batch, total),
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
    )

    (src, _), tgt = next(make_batches(args.vocab, args.seq_len, 4, 1,
                                      seed=99))
    pred = decode(trainer.sync_model(), src, args.seq_len)
    exact = float(np.mean(pred == tgt))
    print("greedy decode token accuracy on held-out batch:", exact)
    print("sample src :", src[0])
    print("sample pred:", pred[0])
    print("sample tgt :", tgt[0])


if __name__ == "__main__":
    main()
