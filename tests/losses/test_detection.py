"""Hungarian matcher / DETR loss / DETR model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chambers_tpu.losses.detection import (
    DETRLoss,
    box_cxcywh_to_xyxy,
    box_iou,
    generalized_box_iou,
    hungarian_matcher,
    linear_sum_assignment,
)


def test_box_conversions_and_iou():
    boxes = jnp.asarray([[0.5, 0.5, 1.0, 1.0]])  # full unit box
    xyxy = np.asarray(box_cxcywh_to_xyxy(boxes))
    np.testing.assert_allclose(xyxy, [[0, 0, 1, 1]], atol=1e-6)

    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.0, 0.0, 0.5, 1.0], [2.0, 2.0, 3.0, 3.0]])
    iou, _ = box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[0.5, 0.0]], atol=1e-6)

    giou = np.asarray(generalized_box_iou(a, b))
    assert giou[0, 0] == pytest.approx(0.5, abs=1e-6)
    assert giou[0, 1] < 0  # disjoint boxes penalized


def test_linear_sum_assignment_optimal():
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.RandomState(0)
    cost = rng.rand(6, 9).astype(np.float32)
    ours = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    rows, cols = scipy_opt.linear_sum_assignment(cost)
    np.testing.assert_array_equal(ours, cols)
    # works under jit too
    ours_jit = np.asarray(jax.jit(linear_sum_assignment)(jnp.asarray(cost)))
    np.testing.assert_array_equal(ours_jit, cols)


def test_hungarian_matcher_prefers_correct_queries():
    b, q, t, classes = 1, 4, 2, 3
    logits = np.full((b, q, classes + 1), -5.0, np.float32)
    logits[0, :, classes] = 5.0  # default: everything predicts no-object
    # query 2 strongly predicts class 0 at box A; query 0 class 1 at box B
    logits[0, 2, 0] = 10.0
    logits[0, 0, 1] = 10.0
    boxes = np.tile([[0.9, 0.9, 0.05, 0.05]], (q, 1)).astype(np.float32)[None]
    boxes[0, 2] = [0.2, 0.2, 0.1, 0.1]
    boxes[0, 0] = [0.7, 0.7, 0.2, 0.2]

    t_labels = np.array([[0, 1]], np.int64)
    t_boxes = np.array([[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2]]],
                       np.float32)
    t_mask = np.ones((1, t), bool)

    assignment = np.asarray(hungarian_matcher(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(t_labels),
        jnp.asarray(t_boxes), jnp.asarray(t_mask),
    ))
    assert assignment[0, 0] == 2  # target 0 -> query 2
    assert assignment[0, 1] == 0  # target 1 -> query 0


def _random_problem(rng, b=2, q=8, t=3, classes=5):
    logits = rng.randn(b, q, classes + 1).astype(np.float32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(b, q, 4))).astype(jnp.float32)
    t_labels = rng.randint(0, classes, (b, t)).astype(np.int64)
    t_boxes = np.abs(rng.rand(b, t, 4)).astype(np.float32) * 0.5 + 0.1
    t_mask = np.ones((b, t), bool)
    t_mask[1, -1] = False  # one padded slot
    return (jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(t_labels),
            jnp.asarray(t_boxes), jnp.asarray(t_mask))


def test_detr_loss_finite_and_differentiable():
    rng = np.random.RandomState(0)
    logits, boxes, t_labels, t_boxes, t_mask = _random_problem(rng)
    loss_fn = DETRLoss(num_classes=5)

    def compute(logits, boxes):
        return loss_fn(
            {"logits": logits, "boxes": boxes},
            {"labels": t_labels, "boxes": t_boxes, "mask": t_mask},
        )

    value = float(compute(logits, boxes))
    assert np.isfinite(value) and value > 0

    grads = jax.grad(compute, argnums=(0, 1))(logits, boxes)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def test_detr_loss_perfect_prediction_is_small():
    classes = 4
    t_labels = jnp.asarray([[1, 2]])
    t_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
    t_mask = jnp.ones((1, 2), bool)

    q = 5
    logits = np.full((1, q, classes + 1), -10.0, np.float32)
    logits[0, :, classes] = 10.0
    logits[0, 0, :] = -10.0
    logits[0, 0, 1] = 10.0
    logits[0, 3, :] = -10.0
    logits[0, 3, 2] = 10.0
    boxes = np.tile([[0.5, 0.5, 0.5, 0.5]], (q, 1)).astype(np.float32)[None]
    boxes[0, 0] = [0.3, 0.3, 0.2, 0.2]
    boxes[0, 3] = [0.7, 0.7, 0.1, 0.1]

    loss_fn = DETRLoss(num_classes=classes)
    value = float(loss_fn(
        {"logits": jnp.asarray(logits), "boxes": jnp.asarray(boxes)},
        {"labels": t_labels, "boxes": t_boxes, "mask": t_mask},
    ))
    assert value < 0.01


def test_detr_loss_aux_layers_sum():
    rng = np.random.RandomState(1)
    logits, boxes, t_labels, t_boxes, t_mask = _random_problem(rng)
    loss_fn = DETRLoss(num_classes=5)
    targets = {"labels": t_labels, "boxes": t_boxes, "mask": t_mask}

    single = float(loss_fn({"logits": logits, "boxes": boxes}, targets))
    stacked = {
        "logits": jnp.stack([logits, logits], axis=1),
        "boxes": jnp.stack([boxes, boxes], axis=1),
    }
    double = float(loss_fn(stacked, targets))
    np.testing.assert_allclose(double, 2 * single, rtol=1e-5)


def test_detr_model_forward_and_train_step():
    from chambers_tpu.models.detection import build_detr

    model = build_detr(num_classes=5, input_shape=(64, 64, 3), num_queries=10,
                       embed_dim=32, num_heads=4, ff_dim=64,
                       num_encoder_layers=1, num_decoder_layers=2)
    x = jnp.zeros((2, 64, 64, 3))
    out = model(np.asarray(x))
    assert out["logits"].shape == (2, 2, 10, 6)  # aux axis = decoder layers
    assert out["boxes"].shape == (2, 2, 10, 4)
    assert (np.asarray(out["boxes"]) >= 0).all()
    assert (np.asarray(out["boxes"]) <= 1).all()

    # one end-to-end grad step through matcher + loss under jit
    loss_fn = DETRLoss(num_classes=5)
    targets = {
        "labels": jnp.asarray([[0, 1], [2, 3]]),
        "boxes": jnp.abs(jnp.asarray(np.random.RandomState(0).rand(2, 2, 4),
                                     jnp.float32)) * 0.4 + 0.1,
        "mask": jnp.ones((2, 2), bool),
    }

    @jax.jit
    def loss_of(params):
        out = model.module.apply({"params": params}, x, deterministic=True)
        return loss_fn(out, targets)

    value, grads = jax.value_and_grad(loss_of)(model.variables["params"])
    assert np.isfinite(float(value))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_auction_assignment_near_optimal():
    """Device-side ε-auction vs scipy optimum: distinct columns, total cost
    within n·eps of optimal on random instances."""
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    from chambers_tpu.losses.detection import auction_assignment

    rng = np.random.RandomState(0)
    for trial in range(5):
        n, m = 12, 40
        cost = rng.rand(n, m).astype(np.float32)
        got = np.asarray(auction_assignment(jnp.asarray(cost), eps=1e-4,
                                            max_iters=500))
        assert len(set(got.tolist())) == n, got  # distinct columns
        rows, cols = scipy_lsa(cost)
        opt = cost[rows, cols].sum()
        ours = cost[np.arange(n), got].sum()
        assert ours <= opt + n * 1e-4 + 1e-6, (trial, ours, opt)


def test_auction_assignment_jittable_and_batched():
    from chambers_tpu.losses.detection import auction_assignment

    rng = np.random.RandomState(1)
    cost = jnp.asarray(rng.rand(3, 8, 20).astype(np.float32))
    out = jax.jit(lambda c: auction_assignment(c))(cost)
    assert out.shape == (3, 8)
    for b in range(3):
        assert len(set(np.asarray(out[b]).tolist())) == 8


def test_detr_loss_auction_matcher_close_to_hungarian():
    """matcher="auction" must be jittable end-to-end and match the exact
    loss on well-separated instances."""
    from chambers_tpu.losses.detection import DETRLoss

    rng = np.random.RandomState(2)
    b, q, t, c = 2, 16, 5, 7
    outputs = {
        "logits": jnp.asarray(rng.randn(b, q, c + 1).astype(np.float32)) * 4,
        "boxes": jax.nn.sigmoid(
            jnp.asarray(rng.randn(b, q, 4).astype(np.float32))),
    }
    targets = {
        "labels": jnp.asarray(rng.randint(0, c, (b, t))),
        "boxes": jax.nn.sigmoid(
            jnp.asarray(rng.randn(b, t, 4).astype(np.float32))),
        "mask": jnp.asarray(np.ones((b, t), bool)),
    }
    exact = DETRLoss(num_classes=c)
    approx = DETRLoss(num_classes=c, matcher="auction")
    l_exact = float(exact(outputs, targets))
    l_auction = float(jax.jit(lambda o, t: approx(o, t))(outputs, targets))
    np.testing.assert_allclose(l_auction, l_exact, rtol=2e-2)
