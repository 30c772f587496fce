"""Fused Pallas TPU kernel for DIN attention pooling (staytime variant).

One VMEM-resident pass per batch tile over reference
``staytime/layer.py:16-41``: build [q, f, q−f, q·f] features, run the
2-layer scorer MLP (sigmoid 16 → linear 1), apply the −2³²+1 mask, softmax
over the sequence, and pool the facts — T ≤ 512 sequences fit on-chip
(SURVEY §5 long-context note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.din import MASK_PAD
from .flags import interpret_mode

DEFAULT_BATCH_TILE = 64


def _din_block(query, facts, mask, w1, b1, w2, b2):
    bt, t, h = facts.shape
    q = jnp.broadcast_to(query[:, None, :], facts.shape)
    feats = jnp.concatenate([q, facts, q - facts, q * facts], axis=-1)  # (Bt,T,4H)
    s = jax.nn.sigmoid(jnp.dot(feats.reshape(bt * t, 4 * h), w1,
                               preferred_element_type=jnp.float32) + b1)
    s = jnp.dot(s, w2, preferred_element_type=jnp.float32) + b2          # (Bt*T, 1)
    scores = s.reshape(bt, t)
    scores = jnp.where(mask > 0, scores, jnp.full_like(scores, MASK_PAD))
    scores = jax.nn.softmax(scores, axis=-1)
    # batched matvec as VPU broadcast-reduce (Mosaic batched-dot workaround)
    return jnp.sum(scores[:, :, None] * facts, axis=1)


def _kernel(q_ref, f_ref, m_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    out_ref[:] = _din_block(q_ref[:], f_ref[:], m_ref[:], w1_ref[:],
                            b1_ref[:], w2_ref[:], b2_ref[:])


def _pallas_forward(query, facts, mask, w1, b1, w2, b2, batch_tile):
    b, t, h = facts.shape
    bt = min(batch_tile, b)
    if b % bt:
        bt = b
    grid = (b // bt,)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((bt, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * (4 * h * 16 + 16) + 2 * b * t * h,
            bytes_accessed=4 * b * t * h * 2,
            transcendentals=b * t * 17),
    )(query, facts, mask, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def din_pool(query, facts, mask, w1, b1, w2, b2,
             batch_tile: int = DEFAULT_BATCH_TILE):
    """query (B, H); facts (B, T, H); mask (B, T) {0,1}; scorer weights
    w1 (4H, 16), b1 (16,), w2 (16, 1), b2 (1,).  Returns (B, H)."""
    return _pallas_forward(query, facts, mask, w1, b1, w2, b2, batch_tile)


def _fwd(query, facts, mask, w1, b1, w2, b2, batch_tile):
    out = _pallas_forward(query, facts, mask, w1, b1, w2, b2, batch_tile)
    return out, (query, facts, mask, w1, b1, w2, b2)


def _bwd(batch_tile, res, g):
    query, facts, mask, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda q, f, w1_, b1_, w2_, b2_: _din_block(q, f, mask, w1_, b1_, w2_, b2_),
        query, facts, w1, b1, w2, b2)
    dq, df, dw1, db1, dw2, db2 = vjp(g)
    return dq, df, None, dw1, db1, dw2, db2


din_pool.defvjp(_fwd, _bwd)
