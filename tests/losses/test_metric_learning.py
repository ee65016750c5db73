"""Metric-learning loss tests.

The numpy "ragged emulation" builds per-row Python lists of kept pair
similarities exactly as the reference's tf.ragged pipeline does
(chambers/losses/metric_learning.py:29-111, miners.py:48-60), then applies the
loss formulas — validating that the dense-mask reformulation is equivalent,
including empty rows and −1-label handling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from chambers_tpu.losses import (
    ContrastiveLoss,
    MultiSimilarityLoss,
    MultiSimilarityLossMatrix,
    NTXentLoss,
)
from chambers_tpu.miners import MultiSimilarityMiner


def _ragged_pairs(sim, labels, ignore_diag=True, ignore_negative_labels=True,
                  ms_miner_margin=None):
    """Reference-semantics ragged pos/neg pair rows as Python lists."""
    n = len(labels)
    pos_rows, neg_rows = [], []
    for i in range(n):
        pos, neg = [], []
        for j in range(n):
            if ignore_diag and i == j:
                continue
            if ignore_negative_labels and labels[j] < 0:
                continue
            if labels[i] == labels[j]:
                pos.append(sim[i, j])
            else:
                neg.append(sim[i, j])
        pos_rows.append(pos)
        neg_rows.append(neg)

    if ms_miner_margin is not None:
        mined_pos, mined_neg = [], []
        for pos, neg in zip(pos_rows, neg_rows):
            pos_thresh = (max(neg) if neg else -np.inf) + ms_miner_margin
            neg_thresh = (min(pos) if pos else np.inf) - ms_miner_margin
            mined_pos.append([p for p in pos if p < pos_thresh])
            mined_neg.append([q for q in neg if q > neg_thresh])
        pos_rows, neg_rows = mined_pos, mined_neg

    return pos_rows, neg_rows


def _ms_loss_rows(pos_rows, neg_rows, alpha=2.0, beta=40.0, lam=0.5):
    out = []
    for pos, neg in zip(pos_rows, neg_rows):
        pos_term = np.log1p(sum(np.exp(-alpha * (np.array(pos) - lam)))) / alpha if pos else 0.0
        neg_term = np.log1p(sum(np.exp(beta * (np.array(neg) - lam)))) / beta if neg else 0.0
        out.append(pos_term + neg_term)
    return np.array(out)


@pytest.fixture
def fixture():
    rng = np.random.RandomState(0)
    emb = rng.randn(8, 16).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2, 0, 1], np.int64)
    sim = emb @ emb.T
    return emb, labels, sim


def test_ms_loss_no_miner(fixture):
    emb, labels, sim = fixture
    loss = MultiSimilarityLoss(miner=None)  # None explicitly disables mining
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels)
    expected = _ms_loss_rows(pos_rows, neg_rows)
    np.testing.assert_allclose(per_row, expected, rtol=1e-5)
    np.testing.assert_allclose(float(loss(labels, emb)), expected.mean(), rtol=1e-5)


def test_ms_loss_with_default_miner(fixture):
    emb, labels, sim = fixture
    loss = MultiSimilarityLoss()  # default MS miner margin=0.1
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels, ms_miner_margin=0.1)
    expected = _ms_loss_rows(pos_rows, neg_rows)
    np.testing.assert_allclose(per_row, expected, rtol=1e-5)


def test_ms_loss_negative_labels_mask_columns(fixture):
    emb, labels, sim = fixture
    labels = labels.copy()
    labels[5] = -1  # triplet negative: excluded as candidate, row kept
    loss = MultiSimilarityLoss(miner=None)
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels)
    expected = _ms_loss_rows(pos_rows, neg_rows)
    np.testing.assert_allclose(per_row, expected, rtol=1e-5)
    # row 5 itself still contributes (neg pairs vs all non-negative columns)
    assert expected[5] > 0


def test_ms_loss_unique_label_empty_pos_row(fixture):
    emb, _, sim = fixture
    labels = np.array([0, 1, 2, 3, 4, 5, 6, 7], np.int64)  # all unique
    loss = MultiSimilarityLoss()
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels, ms_miner_margin=0.1)
    assert all(len(p) == 0 for p in pos_rows)
    expected = _ms_loss_rows(pos_rows, neg_rows)
    np.testing.assert_allclose(per_row, expected, rtol=1e-5)


def test_ms_loss_keep_diag(fixture):
    emb, labels, sim = fixture
    loss = MultiSimilarityLoss(ignore_diag=False, miner=None)
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels, ignore_diag=False)
    expected = _ms_loss_rows(pos_rows, neg_rows)
    np.testing.assert_allclose(per_row, expected, rtol=1e-5)


def test_contrastive_loss(fixture):
    emb, labels, sim = fixture
    loss = ContrastiveLoss()
    per_row = np.asarray(loss.call(labels, emb))
    pos_rows, neg_rows = _ragged_pairs(sim, labels)
    expected = []
    for pos, neg in zip(pos_rows, neg_rows):
        p = sum((1.0 - np.array(pos)) ** 2 / 2) if pos else 0.0
        q = sum(np.maximum(0, np.array(neg) - 0.3) ** 2 / 2) if neg else 0.0
        expected.append(p + q)
    np.testing.assert_allclose(per_row, np.array(expected), rtol=1e-5)


def test_ms_matrix_loss(fixture):
    emb, labels, sim = fixture
    pair_matrix = (labels[:, None] == labels[None, :]).astype(np.float32)
    loss_m = MultiSimilarityLossMatrix()
    loss_e = MultiSimilarityLoss()
    np.testing.assert_allclose(
        np.asarray(loss_m.call(pair_matrix, sim)),
        np.asarray(loss_e.call(labels, emb)),
        rtol=1e-5,
    )


def test_ntxent_vs_tf(fixture):
    tf = pytest.importorskip("tensorflow")
    emb, labels, _ = fixture
    ours = float(NTXentLoss(temperature=0.5)(labels, emb))

    n = len(labels)
    sim = tf.constant(emb @ emb.T / 0.5)
    sim = tf.linalg.set_diag(sim, tf.fill([n], -1e9))
    y = tf.cast(
        tf.equal(tf.reshape(labels, [-1, 1]), tf.reshape(labels, [1, -1])), tf.int32
    )
    y = tf.linalg.set_diag(y, tf.zeros(n, tf.int32))
    expected = float(tf.keras.losses.CategoricalCrossentropy(from_logits=False)(y, sim))
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_ntxent_from_logits(fixture):
    tf = pytest.importorskip("tensorflow")
    emb, labels, _ = fixture
    ours = float(NTXentLoss(temperature=1.0, from_logits=True)(labels, emb))
    n = len(labels)
    sim = tf.constant(emb @ emb.T)
    sim = tf.linalg.set_diag(sim, tf.fill([n], -1e9))
    y = tf.cast(
        tf.equal(tf.reshape(labels, [-1, 1]), tf.reshape(labels, [1, -1])), tf.int32
    )
    y = tf.linalg.set_diag(y, tf.zeros(n, tf.int32))
    expected = float(tf.keras.losses.CategoricalCrossentropy(from_logits=True)(y, sim))
    np.testing.assert_allclose(ours, expected, rtol=1e-4)


def test_miner_masks(fixture):
    emb, labels, sim = fixture
    miner = MultiSimilarityMiner(margin=0.1)
    labels_col = labels[:, None]
    pos_mask = (labels_col == labels_col.T) & ~np.eye(8, dtype=bool)
    neg_mask = (labels_col != labels_col.T) & ~np.eye(8, dtype=bool)
    new_pos, new_neg = miner(jnp.asarray(sim), jnp.asarray(pos_mask), jnp.asarray(neg_mask))
    new_pos, new_neg = np.asarray(new_pos), np.asarray(new_neg)
    for i in range(8):
        negs = sim[i][neg_mask[i]]
        poss = sim[i][pos_mask[i]]
        pos_th = (negs.max() if len(negs) else -np.inf) + 0.1
        neg_th = (poss.min() if len(poss) else np.inf) - 0.1
        np.testing.assert_array_equal(new_pos[i], pos_mask[i] & (sim[i] < pos_th))
        np.testing.assert_array_equal(new_neg[i], neg_mask[i] & (sim[i] > neg_th))


def test_losses_jit_and_grad(fixture):
    import jax

    emb, labels, _ = fixture
    loss = MultiSimilarityLoss()

    @jax.jit
    def f(e):
        return loss(labels, e)

    g = jax.grad(f)(jnp.asarray(emb))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
