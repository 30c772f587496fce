"""Fused Pallas TPU kernel for the InteractingLayer core.

One pass per batch tile fuses what XLA would otherwise schedule as ~10 HBM
round-trips: the four Q/K/V/res projections, head-folded attention
(softmax(QKᵀ/√d_head)·V), residual add, ReLU and LayerNorm — the loop body
of reference ``InteractingLayer.py:41-60``.  Field counts are small
(F ≤ 212) so a whole (Bt, F, *) tile sits in VMEM and each projection is an
MXU matmul over the flattened (Bt·F, D) view.

Forward-only: training uses a ``jax.custom_vjp`` whose backward recomputes
through the XLA reference path (cheap at these shapes), so the fused kernel
serves the latency-critical inference/serving path without a hand-written
backward.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flags import interpret_mode

DEFAULT_BATCH_TILE = 64


def _attention_block(x, wq, bq, wk, bk, wv, bv, wr, br, g, b2, head_num,
                     ln_eps):
    """The fused math on one (Bt, F, D) tile (plain jnp — runs on MXU/VPU)."""
    bt, f, d = x.shape
    u = wq.shape[1]
    dh = u // head_num

    flat = x.reshape(bt * f, d)
    q = jax.nn.relu(jnp.dot(flat, wq, preferred_element_type=jnp.float32) + bq)
    k = jax.nn.relu(jnp.dot(flat, wk, preferred_element_type=jnp.float32) + bk)
    v = jax.nn.relu(jnp.dot(flat, wv, preferred_element_type=jnp.float32) + bv)
    r = jax.nn.relu(jnp.dot(flat, wr, preferred_element_type=jnp.float32) + br)

    q = q.reshape(bt, f, u)
    k = k.reshape(bt, f, u)
    v = v.reshape(bt, f, u)

    # heads as a static Python loop; the attention contraction runs as VPU
    # broadcast-multiply-reduce (d_head and F are tiny at reference scale,
    # and Mosaic's batched-dot path is unreliable on this toolchain)
    outs = []
    for h in range(head_num):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        w = jnp.sum(qh[:, :, None, :] * kh[:, None, :, :], axis=-1) / (dh ** 0.5)
        w = jax.nn.softmax(w, axis=-1)                       # (Bt, F, F)
        outs.append(jnp.sum(w[:, :, :, None] * vh[:, None, :, :], axis=2))
    o = outs[0] if head_num == 1 else jnp.concatenate(outs, axis=-1)
    o = jax.nn.relu(o + r.reshape(bt, f, u))

    mu = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mu), axis=-1, keepdims=True)
    return (o - mu) * jax.lax.rsqrt(var + ln_eps) * g + b2


def _kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wr_ref, br_ref, g_ref, b2_ref, out_ref, *, head_num, ln_eps):
    out_ref[:] = _attention_block(
        x_ref[:], wq_ref[:], bq_ref[:], wk_ref[:], bk_ref[:], wv_ref[:],
        bv_ref[:], wr_ref[:], br_ref[:], g_ref[:], b2_ref[:],
        head_num, ln_eps)


def _pallas_forward(x, params, head_num, ln_eps, batch_tile):
    b, f, d = x.shape
    u = params["wq"].shape[1]
    # cap the tile so the (bt, F, F, dh->128-lane) attention intermediate
    # stays within a few MB of VMEM
    dh_padded = 128
    budget = 4 * 1024 * 1024
    max_bt = max(budget // (f * f * dh_padded * 4), 1)
    bt = min(batch_tile, b, max_bt)
    while b % bt:
        bt -= 1
    grid = (b // bt,)

    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    args = [params[k] for k in
            ("wq", "bq", "wk", "bk", "wv", "bv", "wr", "br", "gamma", "beta")]
    return pl.pallas_call(
        functools.partial(_kernel, head_num=head_num, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((b, f, u), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((bt, f, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [wspec] * 10,
        out_specs=pl.BlockSpec((bt, f, u), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * d * u * 4 + 2 * b * head_num * f * f * (u // head_num) * 2,
            bytes_accessed=4 * (b * f * (d + u) + 4 * d * u),
            transcendentals=b * head_num * f * f),
    )(x, *args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def interacting_attention(x, params: Dict[str, jnp.ndarray], head_num: int = 2,
                          ln_eps: float = 1e-3,
                          batch_tile: int = DEFAULT_BATCH_TILE):
    """Fused InteractingLayer iteration.

    x: (B, F, D); params: wq/wk/wv/wr (D, U), bq/bk/bv/br (U,),
    gamma/beta (U,).  Returns (B, F, U).
    """
    return _pallas_forward(x, params, head_num, ln_eps, batch_tile)


def _reference(x, params, head_num, ln_eps):
    return _attention_block(x, params["wq"], params["bq"], params["wk"],
                            params["bk"], params["wv"], params["bv"],
                            params["wr"], params["br"], params["gamma"],
                            params["beta"], head_num, ln_eps)


def _fwd(x, params, head_num, ln_eps, batch_tile):
    return _pallas_forward(x, params, head_num, ln_eps, batch_tile), (x, params)


def _bwd(head_num, ln_eps, batch_tile, res, g):
    x, params = res
    _, vjp = jax.vjp(lambda x_, p_: _reference(x_, p_, head_num, ln_eps),
                     x, params)
    return vjp(g)


interacting_attention.defvjp(_fwd, _bwd)
