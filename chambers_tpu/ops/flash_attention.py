"""Flash (blockwise) attention Pallas kernel for TPU.

SURVEY.md §5.7: the reference computes dense O(t²) attention as a single
einsum (attention.py:113-125); the right-sized TPU equivalent is a blockwise
flash kernel that never materializes the ``[t, t]`` scores matrix. This kernel
follows the canonical JAX Pallas TPU flash-attention structure: grid over
(batch·heads, q-blocks, kv-blocks), online softmax with float32 running
statistics in VMEM scratch, causal tiles skipped above the diagonal, and a
``custom_vjp`` whose backward is blockwise too — separate dKV and dQ kernels
recompute per-tile probabilities from the saved (l, m) residuals with a
shared precomputed ``di = Σ(o·do)``, so the ``[t, t]`` matrices never
materialize in forward or backward.

Interface: ``flash_attention(q, v, k, scale, causal, kv_mask)`` over
``[batch, heads, t, head_dim]`` — drop-in for the XLA path in
``chambers_tpu.layers.attention.scaled_dot_product_attention`` (selected via
``attention_impl='flash'``).

Padding masks: ``kv_mask`` is a per-batch ``[b, tv]`` key-validity mask (the
reference's ``v_mask`` semantics, attention.py:129-145) applied inside every
tile of the forward and both backward kernels — masked keys contribute
exactly zero probability, so padded seq2seq batches keep the kernel's
fwd+bwd win instead of falling back to XLA. The mask rides a tiny
``[b, block_k]`` VMEM block per tile, indexed ``b // n_heads`` so it is
never materialized per head. Divergence (documented): a query row whose
keys are ALL masked returns zeros here, while the XLA path's additive
``-1e9`` bias softmax returns the uniform average of all values — both
finite; the reference never produces such rows (pad queries are themselves
q-masked).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _flash_fwd_kernel(q_ref, k_ref, v_ref, *refs,
                      scale, causal, block_q, block_k, kv_len, q_len, n_k,
                      has_mask=False):
    if has_mask:
        kv_mask_ref, *refs = refs
    (o_ref, l_out_ref, m_out_ref, m_ref, l_ref, acc_ref) = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    # diagonal aligned at the sequence END (the XLA path's tril(k=tv-tq)
    # convention): query row r attends keys <= r + causal_offset
    causal_offset = kv_len - q_len

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if causal:
        # skip KV blocks fully above the (offset) diagonal
        should_run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]  # [block_q, head_dim]
        k = k_ref[0]  # [block_k, head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale

        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
            + ki * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) \
                + qi * block_q
            mask &= col <= row + causal_offset
        if has_mask:
            mask &= kv_mask_ref[0] > 0.0              # [1, block_k] bcast
        s = jnp.where(mask, s, _MASK_VALUE)

        m_prev = m_ref[...]            # [block_q, LANES] (tiled copies)
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1)[:, None]          # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)          # [block_q, LANES]
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])                # [block_q, block_k]
        if has_mask:
            # exp underflow already zeroes masked cols when the row has any
            # valid key; the explicit zero makes fully-masked rows sum to
            # l == 0 -> zero output instead of a uniform average
            p = jnp.where(mask, p, 0.0)
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1)[:, None] + l_corr

        m_ref[...] = m_next
        l_ref[...] = l_next

        l_next_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        acc_ref[...] = acc_ref[...] * (l_corr * l_next_inv)[:, :1]
        v = v_ref[0]
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_ref[...] += o_curr * l_next_inv[:, :1]

    @pl.when(ki == n_k - 1)
    def _store():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)
        l_out_ref[0] = l_ref[...][:, :1]
        m_out_ref[0] = m_ref[...][:, :1]


def _operand_vma(*operands):
    """Union of the operands' varying-mesh-axes sets.

    Under `shard_map(..., check_vma=True)` (the default) pallas_call's
    `out_shape` must declare which mesh axes the outputs vary over; outside
    shard_map the union is simply the empty set. Propagating the input vma
    keeps strict vma checking ON at the shard_map call sites (e.g.
    parallel/context_parallel.py) instead of opting out per call.
    """
    vma = frozenset()
    for x in operands:
        vma = vma | getattr(jax.typeof(x), "vma", frozenset())
    return vma


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, scale, causal, block_q, block_k, interpret,
                   kv_mask=None, n_heads=1):
    """Core padded pallas call over [bn, t, h] operands; returns (o, l, m).

    ``kv_mask`` (optional) is ``[b, tk]`` float (1.0 valid / 0.0 masked),
    shared across the ``n_heads`` heads folded into bn via the index map."""
    bn, tq, h = q.shape
    tk = k.shape[1]

    q_p = _pad_to(q, 1, block_q)
    k_p = _pad_to(k, 1, block_k)
    v_p = _pad_to(v, 1, block_k)
    n_q = q_p.shape[1] // block_q
    n_k = k_p.shape[1] // block_k

    has_mask = kv_mask is not None
    if has_mask:
        # [b, 1, tk]: Mosaic requires the last two block dims be (8, 128)-
        # divisible OR equal to the array dims — a unit middle dim satisfies
        # that where a 2-D [b, tk] operand with block (1, block_k) cannot
        kv_mask = kv_mask[:, None, :]
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=tk, q_len=tq, n_k=n_k,
        has_mask=has_mask,
    )
    vma = _operand_vma(q, k, v) if not has_mask else \
        _operand_vma(q, k, v, kv_mask)
    out_shapes = (
        jax.ShapeDtypeStruct(q_p.shape, q.dtype, vma=vma),                 # o
        jax.ShapeDtypeStruct((bn, q_p.shape[1], 1), jnp.float32, vma=vma),  # l
        jax.ShapeDtypeStruct((bn, q_p.shape[1], 1), jnp.float32, vma=vma),  # m
    )
    in_specs = [
        pl.BlockSpec((1, block_q, h), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((1, block_k, h), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((1, block_k, h), lambda b, qi, ki: (b, ki, 0)),
    ]
    operands = [q_p, k_p, v_p]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_k), lambda b, qi, ki, nh=n_heads: (b // nh, 0, ki)))
        operands.append(_pad_to(kv_mask, 2, block_k))
    o, l, m = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(bn, n_q, n_k),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, h), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, qi, ki: (b, qi, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, h), jnp.float32),       # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return o[:, :tq], l[:, :tq], m[:, :tq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, causal, block_q, block_k, interpret):
    o, _, _ = _flash_forward(q, k, v, scale, causal, block_q, block_k,
                             interpret)
    return o


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret):
    o, l, m = _flash_forward(q, k, v, scale, causal, block_q, block_k,
                             interpret)
    return o, (q, k, v, o, l, m)


def _recomputed_p_ds(q, k, v, do, l, m, di, *, scale, causal, causal_offset,
                     q_base, k_base, kv_len, q_len, block_q, block_k,
                     kv_mask=None):
    """Shared tile math for both backward kernels: recompute the softmax
    probabilities of one (q-block, kv-block) tile from the saved (l, m)
    residuals and form ds = p * (dp - di)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_base
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + k_base
    mask = (col < kv_len) & (row < q_len)
    if causal:
        mask &= col <= row + causal_offset
    if kv_mask is not None:
        mask &= kv_mask > 0.0                          # [1, block_k] bcast

    l_safe = jnp.where(l == 0.0, 1.0, l)
    p = jnp.where(mask, jnp.exp(s - m) / l_safe, 0.0)      # [bq, bk]

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di)
    return p, ds


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
                          *refs, scale, causal, block_q, block_k, kv_len,
                          q_len, n_q, has_mask=False):
    if has_mask:
        kv_mask_ref, *refs = refs
    (dk_ref, dv_ref, dk_acc, dv_acc) = refs
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    causal_offset = kv_len - q_len

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    if causal:
        # this kv block only receives gradient from q rows at/after it
        should_run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        p, ds = _recomputed_p_ds(
            q, k, v, do, l_ref[0], m_ref[0], di_ref[0],
            scale=scale, causal=causal, causal_offset=causal_offset,
            q_base=qi * block_q, k_base=ki * block_k,
            kv_len=kv_len, q_len=q_len, block_q=block_q, block_k=block_k,
            kv_mask=kv_mask_ref[0] if has_mask else None,
        )
        # dv += pᵀ · do ; dk += dsᵀ · q · scale
        dv_acc[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(qi == n_q - 1)
    def _store():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, m_ref, di_ref,
                         *refs, scale, causal, block_q, block_k, kv_len,
                         q_len, n_k, has_mask=False):
    if has_mask:
        kv_mask_ref, *refs = refs
    (dq_ref, dq_acc) = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    causal_offset = kv_len - q_len

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    if causal:
        should_run = (qi + 1) * block_q - 1 + causal_offset >= ki * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        _, ds = _recomputed_p_ds(
            q, k, v, do, l_ref[0], m_ref[0], di_ref[0],
            scale=scale, causal=causal, causal_offset=causal_offset,
            q_base=qi * block_q, k_base=ki * block_k,
            kv_len=kv_len, q_len=q_len, block_q=block_q, block_k=block_k,
            kv_mask=kv_mask_ref[0] if has_mask else None,
        )
        # dq += ds · k · scale
        dq_acc[...] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(ki == n_k - 1)
    def _store():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, l, m, do, *, scale, causal, block_q, block_k,
                    interpret, kv_mask=None, n_heads=1):
    """Blockwise backward: recompute each tile's probabilities from the saved
    (l, m) residuals and accumulate dq/dk/dv in VMEM — the [t, t] matrices are
    never materialized (guide §7: separate dKV and dQ kernels sharing a
    precomputed di = Σ(o·do))."""
    bn, tq, h = q.shape
    tk = k.shape[1]

    di = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [bn, tq, 1]

    q_p = _pad_to(q, 1, block_q)
    do_p = _pad_to(do, 1, block_q)
    l_p = _pad_to(l, 1, block_q)
    m_p = _pad_to(m, 1, block_q)
    di_p = _pad_to(di, 1, block_q)
    k_p = _pad_to(k, 1, block_k)
    v_p = _pad_to(v, 1, block_k)
    n_q = q_p.shape[1] // block_q
    n_k = k_p.shape[1] // block_k

    has_mask = kv_mask is not None
    # [b, 1, tk] for the same Mosaic block-shape rule as the forward
    mask_p = _pad_to(kv_mask[:, None, :], 2, block_k) if has_mask else None
    mask_operands = [mask_p] if has_mask else []

    vma = _operand_vma(q, k, v, do) if not has_mask else \
        _operand_vma(q, k, v, do, kv_mask)
    common = dict(scale=scale, causal=causal, block_q=block_q,
                  block_k=block_k, kv_len=tk, q_len=tq, has_mask=has_mask)

    q_spec = pl.BlockSpec((1, block_q, h), lambda b, i, j: (b, j, 0))
    kv_spec = pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, i, 0))
    stat_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0))
    # dkv grid is (bn, kv-block i, q-block j): the mask follows the kv block
    mask_spec = [pl.BlockSpec(
        (1, 1, block_k), lambda b, i, j, nh=n_heads: (b // nh, 0, i)
    )] if has_mask else []

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, n_q=n_q, **common),
        out_shape=(
            jax.ShapeDtypeStruct(k_p.shape, k.dtype, vma=vma),
            jax.ShapeDtypeStruct(v_p.shape, v.dtype, vma=vma),
        ),
        grid=(bn, n_k, n_q),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec, stat_spec,
                  stat_spec] + mask_spec,
        out_specs=(
            pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, h), jnp.float32),
            pltpu.VMEM((block_k, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, l_p, m_p, di_p, *mask_operands)

    q_spec2 = pl.BlockSpec((1, block_q, h), lambda b, i, j: (b, i, 0))
    kv_spec2 = pl.BlockSpec((1, block_k, h), lambda b, i, j: (b, j, 0))
    stat_spec2 = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))
    # dq grid is (bn, q-block i, kv-block j)
    mask_spec2 = [pl.BlockSpec(
        (1, 1, block_k), lambda b, i, j, nh=n_heads: (b // nh, 0, j)
    )] if has_mask else []

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, n_k=n_k, **common),
        out_shape=jax.ShapeDtypeStruct(q_p.shape, q.dtype, vma=vma),
        grid=(bn, n_q, n_k),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, stat_spec2,
                  stat_spec2, stat_spec2] + mask_spec2,
        out_specs=pl.BlockSpec((1, block_q, h), lambda b, i, j: (b, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_p, k_p, v_p, do_p, l_p, m_p, di_p, *mask_operands)

    return dq[:, :tq], dk[:, :tk], dv[:, :tk]


def _flash_bwd(scale, causal, block_q, block_k, interpret, residuals, do):
    q, k, v, o, l, m = residuals
    return _flash_backward(q, k, v, o, l, m, do, scale=scale, causal=causal,
                           block_q=block_q, block_k=block_k,
                           interpret=interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_masked(q, k, v, kv_mask, scale, causal, block_q, block_k,
                  n_heads, interpret):
    o, _, _ = _flash_forward(q, k, v, scale, causal, block_q, block_k,
                             interpret, kv_mask=kv_mask, n_heads=n_heads)
    return o


def _flash_masked_fwd(q, k, v, kv_mask, scale, causal, block_q, block_k,
                      n_heads, interpret):
    o, l, m = _flash_forward(q, k, v, scale, causal, block_q, block_k,
                             interpret, kv_mask=kv_mask, n_heads=n_heads)
    return o, (q, k, v, kv_mask, o, l, m)


def _flash_masked_bwd(scale, causal, block_q, block_k, n_heads, interpret,
                      residuals, do):
    q, k, v, kv_mask, o, l, m = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, o, l, m, do, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, interpret=interpret, kv_mask=kv_mask,
        n_heads=n_heads)
    # the mask is non-differentiable; a zero cotangent keeps custom_vjp happy
    return dq, dk, dv, jnp.zeros_like(kv_mask)


_flash_masked.defvjp(_flash_masked_fwd, _flash_masked_bwd)


def _auto_block(t):
    """Default block size for sequence length ``t`` (see flash_attention)."""
    padded = -(-t // 128) * 128
    if padded <= 1024:
        return padded  # one exact-fit block (backward fits vmem: measured
        # OK at t=1024 single-block)
    if padded <= 2048:
        # a fixed 512 here can pad badly (t=1100 -> 1536, +40%); pick the
        # 128-multiple block in [384, 768] minimizing total padded length
        # (384 floor: 128-blocks lose 13-26% to larger blocks on v5e even
        # unpadded; 768 ceiling: multi-block 1024 blows the 16 MB scoped
        # vmem limit in the backward dKV kernel — ~18.65 MB stack at
        # t=2048 — while 768 measured OK). Ties -> the largest block.
        # Measured fwd+bwd: t=1100 auto(384) 4.42 ms vs 512-blocks 5.39;
        # t=1536 auto(768) 4.74 vs 5.03.
        return min(
            (b for b in range(768, 383, -128)),
            key=lambda b: -(-padded // b) * b,
        )
    return 512


def flash_attention(
    query,
    value,
    key=None,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_mask=None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Blockwise attention over ``[batch, heads, t, head_dim]`` tensors.

    Numerically equivalent to softmax(q·kᵀ/√h)·v (float32 statistics); the
    ``[t, t]`` scores matrix is never materialized in the forward pass.
    Differentiable via custom VJP.

    ``kv_mask`` is an optional ``[batch, tv]`` boolean key-validity mask
    (True = attend); masked keys get exactly zero probability in forward and
    backward. Rows with no valid key return zeros (see module docstring for
    the documented divergence from the XLA path's uniform average).

    Default block sizes (``tools/bench_flash_attention.py``, v5e): one
    exact-fit block (t rounded up to 128) when that stays ≤1024 — avoiding
    the padding blow-up of a fixed block size (e.g. t=577 with 512-blocks
    pads to 1024: 946 ms vs 596 ms on a ViT-L/16@384 forward) — and 512×512
    for longer sequences, where 512-blocks beat both 128×128 and XLA's dense
    attention for fwd+bwd at every measured length (13–26%).
    """
    if key is None:
        key = value
    b, n, tq, h = query.shape
    tk = value.shape[2]
    if block_q is None:
        block_q = _auto_block(tq)
    if block_k is None:
        block_k = _auto_block(tk)
    if scale is None:
        scale = 1.0 / math.sqrt(h)
    else:
        scale = 1.0 / float(scale)  # must be a static Python scalar

    if interpret is None:
        # Mosaic kernels compile only for TPU; CPU (tests / simulated
        # meshes) runs the interpreter, which is numerically identical.
        # Callers running under a mesh whose devices differ from the
        # default backend (e.g. a CPU debug mesh on a TPU host) pass
        # `interpret` explicitly — parallel/context_parallel.py does.
        interpret = jax.default_backend() == "cpu"
    fold = lambda x: x.reshape(b * n, x.shape[2], h)
    if kv_mask is not None:
        if kv_mask.shape != (b, tk):
            raise ValueError(
                f"kv_mask shape {kv_mask.shape} != (batch, tv) = {(b, tk)}")
        out = _flash_masked(fold(query), fold(key), fold(value),
                            kv_mask.astype(jnp.float32),
                            scale, causal, block_q, block_k, n,
                            bool(interpret))
    else:
        out = _flash(fold(query), fold(key), fold(value),
                     scale, causal, block_q, block_k, bool(interpret))
    return out.reshape(b, n, tq, h)
