"""DETR-style detection losses with Hungarian matching.

BASELINE.json config 5 (stretch beyond the reference — SURVEY.md §2.4 notes
the reference v1 has no matcher/DETR loss; its DETR lineage is only
``PositionalEncoding2D`` and ``Decoder(return_sequence=True)``). This module
supplies the missing pieces TPU-first:

- :func:`hungarian_matcher` — optimal bipartite assignment. The assignment
  itself is tiny, sequential bookkeeping (O(n³) on ~100 queries), exactly the
  kind of work that does NOT belong on the MXU; it runs on host via
  ``jax.pure_callback`` (scipy Jonker-Volgenant) inside jit, outside the
  gradient path — the cost *matrix* is computed on device.
- :class:`DETRLoss` — classification CE with no-object down-weighting, L1 box
  loss, generalized IoU, normalized by the number of target boxes; supports
  per-decoder-layer auxiliary losses (the reference's
  ``return_sequence=True`` output, transformer.py:410-426).

Boxes use normalized ``(cx, cy, w, h)``.
"""

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# box utilities
# ---------------------------------------------------------------------------

def box_cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_area(boxes_xyxy):
    return (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * (
        boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    )


def box_iou(boxes1, boxes2):
    """Pairwise IoU of ``[n, 4]`` and ``[m, 4]`` xyxy boxes → ``[n, m]``."""
    area1 = box_area(boxes1)[:, None]
    area2 = box_area(boxes2)[None, :]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-8), union


def generalized_box_iou(boxes1, boxes2):
    """Pairwise GIoU (Rezatofighi et al.) of xyxy boxes → ``[n, m]``."""
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    enclosing = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-8)
    return iou - (enclosing - union) / enclosing


def paired_generalized_box_iou(boxes1, boxes2):
    """Elementwise GIoU of matched xyxy box pairs ``[..., 4]`` → ``[...]``
    (O(n), vs. taking the diagonal of the pairwise matrix)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-8)

    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0)
    enclosing = jnp.maximum(wh_c[..., 0] * wh_c[..., 1], 1e-8)
    return iou - (enclosing - union) / enclosing


# ---------------------------------------------------------------------------
# Hungarian matching
# ---------------------------------------------------------------------------

def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Host-side optimal assignment: per-row matched column indices.

    Requires ``n <= m`` (every row/target gets a distinct column/query);
    ``n > m`` would silently leave zero-initialized rows colliding on
    column 0 downstream, so it fails loudly instead.
    """
    from scipy.optimize import linear_sum_assignment

    n, m = cost.shape[-2], cost.shape[-1]
    if n > m:
        raise ValueError(
            f"linear_sum_assignment needs rows <= cols; got {n} targets for "
            f"{m} queries — raise num_queries above max targets per image."
        )
    out = np.zeros(cost.shape[:-2] + (n,), np.int32)
    flat_cost = cost.reshape((-1,) + cost.shape[-2:])
    flat_out = out.reshape(-1, n)
    for i, c in enumerate(flat_cost):
        rows, cols = linear_sum_assignment(np.asarray(c, np.float64))
        flat_out[i, rows] = cols
    return out


def linear_sum_assignment(cost_matrix):
    """Jit-compatible optimal assignment via host callback.

    :param cost_matrix: ``[..., n, m]`` with ``n <= m``.
    :return: ``[..., n]`` int32 — column assigned to each row.
    """
    n = cost_matrix.shape[-2]
    result_shape = jax.ShapeDtypeStruct(cost_matrix.shape[:-2] + (n,), jnp.int32)
    return jax.pure_callback(
        _lsa_host, result_shape, cost_matrix, vmap_method="sequential"
    )


def matching_cost_matrix(
    pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
    cost_class: float = 1.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
):
    """Per-example DETR matching costs ``[b, t, q]`` (rows = target slots);
    padded target slots get a large constant cost."""

    def per_example(logits, boxes, t_labels, t_boxes, t_mask):
        prob = jax.nn.softmax(logits, axis=-1)
        c_class = -prob[:, t_labels]
        c_bbox = jnp.sum(jnp.abs(boxes[:, None] - t_boxes[None]), axis=-1)
        c_giou = -generalized_box_iou(
            box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(t_boxes)
        )
        cost = cost_class * c_class + cost_bbox * c_bbox + cost_giou * c_giou
        cost = jnp.where(t_mask[None, :], cost, 1e6)
        return cost.T  # [t, q]

    return jax.vmap(per_example)(
        pred_logits, pred_boxes, target_labels, target_boxes, target_mask
    )


def hungarian_matcher(
    pred_logits,
    pred_boxes,
    target_labels,
    target_boxes,
    target_mask,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
):
    """Optimal query↔target assignment per batch element (DETR §3.1 costs).

    Targets are dense-padded: ``target_labels [b, max_t]``,
    ``target_boxes [b, max_t, 4]``, ``target_mask [b, max_t]`` bool (True for
    real boxes). Padded columns get +inf-ish cost so real targets always win;
    the returned assignment ``[b, n_queries]`` maps each *target slot* to a
    query — consume it together with ``target_mask``.

    :return: ``[b, max_t]`` int32: for each target slot, the matched query.
    """
    cost = matching_cost_matrix(
        pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
        cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
    )
    return linear_sum_assignment(jax.lax.stop_gradient(cost))


def hungarian_matcher_host(
    pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
    cost_class: float = 1.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
):
    """Eager host-side matcher (no callbacks at all) — for PJRT backends
    that reject host callbacks even under vmap/scan. Cost matrices compute
    on device; scipy assigns on host."""
    cost = matching_cost_matrix(
        pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
        cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
    )
    return jnp.asarray(_lsa_host(np.asarray(cost)))


def auction_assignment(cost, eps: float = 1e-3, max_iters: int = 200):
    """Device-side approximate LAP: Bertsekas auction, fully jittable.

    The exact matcher round-trips to the host per step
    (``linear_sum_assignment``'s ``pure_callback``), which serializes the
    training loop on host↔device latency — prohibitive on relay-attached
    chips and inside device-resident ``lax.scan`` loops. The auction runs on
    device: unassigned rows (targets) bid ``v1 − v2 + eps`` for their best
    column (query), columns go to the highest bidder, prices rise until all
    rows hold distinct columns. ε-complementary slackness ⇒ the result is
    within ``n·eps`` of optimal (exact when cost gaps exceed ``eps``).

    :param cost: ``[..., n, m]`` with ``n <= m`` (vmapped over leading dims).
    :return: ``[..., n]`` int32 — a distinct column per row. Rows still
        unassigned at ``max_iters`` (pathological ties) fall back to their
        current best column, which may collide; raise ``max_iters`` if that
        matters.
    """
    n, m = cost.shape[-2], cost.shape[-1]
    if n > m:
        raise ValueError(
            f"auction_assignment needs rows <= cols; got {n} rows for "
            f"{m} columns."
        )

    def single(c):
        benefit = -c.astype(jnp.float32)
        cols = jnp.arange(m)

        def cond(state):
            price, row2col, it = state
            return jnp.logical_and(it < max_iters, jnp.any(row2col < 0))

        def body(state):
            price, row2col, it = state
            unassigned = row2col < 0
            value = benefit - price[None, :]
            j1 = jnp.argmax(value, axis=1)
            v1 = jnp.max(value, axis=1)
            masked = jnp.where(cols[None, :] == j1[:, None], -jnp.inf, value)
            v2 = jnp.max(masked, axis=1)
            # single-column case: no second-best — bid a fixed increment
            bid = price[j1] + jnp.where(
                jnp.isfinite(v2), v1 - v2, 0.0) + eps
            bidding = unassigned
            bids = jnp.where(
                (cols[None, :] == j1[:, None]) & bidding[:, None],
                bid[:, None], -jnp.inf,
            )  # [n, m]
            col_best = jnp.max(bids, axis=0)
            col_winner = jnp.argmax(bids, axis=0)
            has_bid = col_best > -jnp.inf

            owned = row2col >= 0
            cur = jnp.clip(row2col, 0)
            dethroned = owned & has_bid[cur] & (
                col_winner[cur] != jnp.arange(n))
            won = bidding & has_bid[j1] & (
                col_winner[j1] == jnp.arange(n))
            row2col = jnp.where(won, j1,
                                jnp.where(dethroned, -1, row2col))
            price = jnp.where(has_bid, col_best, price)
            return price, row2col, it + 1

        _, row2col, _ = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((m,), jnp.float32), jnp.full((n,), -1, jnp.int32),
             jnp.zeros((), jnp.int32)),
        )
        # unconverged leftovers (max_iters pathology): hand out DISTINCT
        # free columns by rank — a colliding fallback would make the
        # downstream target-class scatter write duplicate indices in
        # undefined order (nondeterministic loss)
        unassigned = row2col < 0
        owned = jnp.zeros((m,), bool).at[
            jnp.where(unassigned, m, row2col)].set(True, mode="drop")
        free_in_order = jnp.argsort(jnp.where(owned, m + cols, cols))
        rank = jnp.cumsum(unassigned) - 1                  # [n]
        fallback = free_in_order[jnp.clip(rank, 0)].astype(jnp.int32)
        return jnp.where(unassigned, fallback, row2col).astype(jnp.int32)

    flat = cost.reshape((-1, n, m))
    out = jax.vmap(single)(flat)
    return out.reshape(cost.shape[:-2] + (n,))


def auction_matcher(
    pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
    cost_class: float = 1.0, cost_bbox: float = 5.0, cost_giou: float = 2.0,
    eps: float = 1e-3, max_iters: int = 200,
):
    """Device-side approximate matcher (same contract as
    :func:`hungarian_matcher`, no host callback)."""
    cost = matching_cost_matrix(
        pred_logits, pred_boxes, target_labels, target_boxes, target_mask,
        cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
    )
    return auction_assignment(jax.lax.stop_gradient(cost),
                              eps=eps, max_iters=max_iters)


# ---------------------------------------------------------------------------
# DETR loss
# ---------------------------------------------------------------------------

class DETRLoss:
    """Set-prediction loss: Hungarian matching + CE / L1 / GIoU terms.

    :param num_classes: number of object classes; class id ``num_classes`` is
        the no-object class.
    :param eos_coef: down-weighting of the no-object CE term (DETR: 0.1).
    :param matcher: ``"hungarian"`` (exact, host ``pure_callback`` inside
        jit) or ``"auction"`` (approximate ε-auction, fully on device — use
        when the per-step host round-trip dominates, e.g. device-resident
        scan loops or relay-attached chips; see BASELINE.md config 5).
    :param matcher_eps: auction bid increment; suboptimality is bounded by
        ``n_targets · eps``. The 1e-2 default measured 0% actual gap vs the
        scipy optimum on DETR-scale costs while converging ~2x faster than
        1e-3 (the padded 1e6-cost rows bid in fixed eps steps).
    """

    def __init__(self, num_classes: int, cost_class=1.0, cost_bbox=5.0,
                 cost_giou=2.0, weight_ce=1.0, weight_bbox=5.0,
                 weight_giou=2.0, eos_coef: float = 0.1,
                 matcher: str = "hungarian", matcher_eps: float = 1e-2,
                 matcher_iters: int = 200):
        if matcher not in ("hungarian", "auction"):
            raise ValueError(f"Unknown matcher '{matcher}'")
        self.matcher = matcher
        self.matcher_eps = matcher_eps
        self.matcher_iters = matcher_iters
        self.num_classes = num_classes
        self.cost_class = cost_class
        self.cost_bbox = cost_bbox
        self.cost_giou = cost_giou
        self.weight_ce = weight_ce
        self.weight_bbox = weight_bbox
        self.weight_giou = weight_giou
        self.eos_coef = eos_coef

    def __call__(self, outputs: Dict, targets: Dict,
                 assignment=None) -> jnp.ndarray:
        """Total loss.

        :param outputs: ``{"logits": [b, q, classes+1], "boxes": [b, q, 4]}``
            or with a leading aux-layer axis ``[b, L, q, ...]`` (the
            ``Decoder(return_sequence=True)`` output) — aux layers get the
            same loss summed.
        :param targets: ``{"labels": [b, t], "boxes": [b, t, 4],
            "mask": [b, t]}``.
        :param assignment: optional precomputed matching from :meth:`match`
            (``[b, t]``, or ``[L, b, t]`` with aux layers). Matching runs on
            host via ``pure_callback``; some PJRT backends reject host
            callbacks inside jit — there, call ``match`` eagerly outside the
            jitted step and pass the result here (the loss itself is then
            fully jittable everywhere).
        """
        logits, boxes = outputs["logits"], outputs["boxes"]
        if logits.ndim == 4:  # [b, L, q, c] aux losses per decoder layer
            n_layers = logits.shape[1]
            if assignment is None and self.matcher == "auction":
                # match every aux layer in ONE batched auction: L separate
                # while_loops run their (tiny [t, q]) iterations serially on
                # the core; folding the layer axis into the vmap runs them
                # in lockstep (measured 20.8 -> ~7 ms/step on the config-5
                # bench, batch 8, 7 layers)
                assignment = self._auction_all_layers(logits, boxes, targets)
            total = 0.0
            for layer in range(n_layers):
                total = total + self._single(
                    logits[:, layer], boxes[:, layer], targets,
                    None if assignment is None else assignment[layer],
                )
            return total
        return self._single(logits, boxes, targets, assignment)

    def _auction_all_layers(self, logits, boxes, targets):
        """``[L, b, t]`` device-side assignments for ``[b, L, q, *]``
        outputs, one lockstep auction over the folded (L·b) batch."""
        b, n_layers = logits.shape[0], logits.shape[1]
        t = targets["labels"].shape[1]
        flat_logits = logits.transpose(1, 0, 2, 3).reshape(
            (n_layers * b,) + logits.shape[2:])
        flat_boxes = boxes.transpose(1, 0, 2, 3).reshape(
            (n_layers * b,) + boxes.shape[2:])
        tile = lambda x: jnp.concatenate([x] * n_layers, axis=0)
        flat = auction_matcher(
            flat_logits, flat_boxes, tile(targets["labels"]),
            tile(targets["boxes"]), tile(targets["mask"].astype(bool)),
            cost_class=self.cost_class, cost_bbox=self.cost_bbox,
            cost_giou=self.cost_giou, eps=self.matcher_eps,
            max_iters=self.matcher_iters,
        )
        return flat.reshape(n_layers, b, t)

    def match(self, outputs: Dict, targets: Dict):
        """Hungarian assignment(s) for ``outputs``, computed eagerly with
        the host-side matcher (works on every backend — no callbacks inside
        compiled code). Feed the result to ``__call__``."""
        logits, boxes = outputs["logits"], outputs["boxes"]
        kwargs = dict(cost_class=self.cost_class, cost_bbox=self.cost_bbox,
                      cost_giou=self.cost_giou)
        t = (targets["labels"], targets["boxes"],
             targets["mask"].astype(bool))
        if logits.ndim == 4:
            return jnp.stack([
                hungarian_matcher_host(logits[:, i], boxes[:, i], *t, **kwargs)
                for i in range(logits.shape[1])
            ])
        return hungarian_matcher_host(logits, boxes, *t, **kwargs)

    def _single(self, logits, boxes, targets, assignment=None):
        t_labels = targets["labels"]
        t_boxes = targets["boxes"]
        t_mask = targets["mask"].astype(bool)

        if assignment is None:
            kwargs = dict(cost_class=self.cost_class,
                          cost_bbox=self.cost_bbox,
                          cost_giou=self.cost_giou)
            if self.matcher == "auction":
                kwargs.update(eps=self.matcher_eps,
                              max_iters=self.matcher_iters)
                match_fn = auction_matcher
            else:
                match_fn = hungarian_matcher
            assignment = match_fn(
                logits, boxes, t_labels, t_boxes, t_mask, **kwargs,
            )  # [b, t] query index per target slot

        b, q = logits.shape[0], logits.shape[1]
        num_boxes = jnp.maximum(jnp.sum(t_mask), 1.0)

        # --- classification: matched queries get the target label, everyone
        # else the no-object class ---
        target_classes = jnp.full((b, q), self.num_classes, jnp.int32)
        batch_idx = jnp.arange(b)[:, None]
        # padded target slots scatter the no-object class (a no-op write)
        scatter_labels = jnp.where(t_mask, t_labels, self.num_classes)
        target_classes = target_classes.at[batch_idx, assignment].set(
            scatter_labels
        )
        log_p = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(
            log_p, target_classes[..., None], axis=-1
        )[..., 0]
        class_weights = jnp.where(
            target_classes == self.num_classes, self.eos_coef, 1.0
        )
        loss_ce = jnp.sum(ce * class_weights) / jnp.sum(class_weights)

        # --- box losses on matched pairs ---
        matched_boxes = boxes[batch_idx, assignment]       # [b, t, 4]
        l1 = jnp.sum(jnp.abs(matched_boxes - t_boxes), axis=-1)
        loss_bbox = jnp.sum(jnp.where(t_mask, l1, 0.0)) / num_boxes

        giou = paired_generalized_box_iou(
            box_cxcywh_to_xyxy(matched_boxes), box_cxcywh_to_xyxy(t_boxes)
        )
        loss_giou = jnp.sum(jnp.where(t_mask, 1.0 - giou, 0.0)) / num_boxes

        return (self.weight_ce * loss_ce
                + self.weight_bbox * loss_bbox
                + self.weight_giou * loss_giou)
