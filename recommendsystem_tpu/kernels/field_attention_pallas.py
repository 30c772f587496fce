"""Flash-style field attention for the InteractingLayer at large field
counts (batch-lane blocked, F×F×B never materialized in HBM).

Why: the XLA training path (``nn/interacting.py::_xla_iteration_t``)
materializes the (head, F, F, B) score tensor ~10 times across fwd + bwd.
At reference production scale (``rank/ctr/model_parameter.json``: 212
features → F = 175 effective fields, batch 8192) each of those tensors is
2.0 GB; the round-5 op trace measured ~100 ms/step of pure HBM streaming in
them — the entire gap between ctr_production212 (26.6 µs/example) and the
headline autoint (2.4 µs/example) at F = 24.  FLOP-wise the attention is
tiny (d_head ≤ 8): it is pure layout.  This kernel keeps each (Fq_tile, F,
B_tile) score block in VMEM, so HBM traffic drops to Q/K/V/dO/O — O(F·B)
instead of O(F²·B).

Layout: the TRANSPOSED (head, d_head, F, B) layout of the round-4 attention
redesign — batch rides the 128-wide lane dim, fields ride sublanes, and the
per-sample contraction over d_head (4) unrolls as VPU broadcast-multiply
adds (Mosaic's batched-dot path is unusable on this toolchain — CLAUDE.md).
F pads to a multiple of the 8-row query tile; padded KEY fields are masked
to -1e9 before the softmax (a padded key must get probability 0 — zero
scores would get exp(0) = 1), padded query rows are garbage and sliced off.

Attention-weight dropout (``InteractingLayer.py:53-54``) runs IN-KERNEL on
the hardware PRNG (``pltpu.prng_random_bits``): the backward kernel reseeds
with the same (seed, head, fq, batch) tuple and regenerates the identical
mask, so no mask tensor ever touches HBM and no threefry program runs (the
flax threefry dropout measured ~15-22 ms/step in the round-4/5 traces).
The mask distribution matches flax (keep-prob scaling); the stream differs,
which is irrelevant to training statistics and exercised by the
FD-consistency test (``tests/test_kernels.py``).

softmax over keys per (query, sample) is EXACT (whole F in VMEM — fields
are ≤ 212 by reference schema), so unlike true flash attention no online
rescaling or saved stats are needed; the backward recomputes probabilities
from Q/K.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flags import interpret_mode

FQ_TILE = 8          # query-field rows per grid step (f32 sublane tile)
BATCH_TILE = 128     # samples per grid step (lane width)
_VMEM_BUDGET = 10 << 20


def _key_mask_bias(fq_t: int, f_pad: int, bt: int, f: int):
    """(fq_t, f_pad, bt) additive bias: -1e9 on padded key fields."""
    if f == f_pad:
        return None
    fk = jax.lax.broadcasted_iota(jnp.int32, (fq_t, f_pad, bt), 1)
    return jnp.where(fk < f, 0.0, -1e9).astype(jnp.float32)


def _grid_salt(h, fq, nb):
    """One int32 mixing the grid cell into the PRNG seed (Mosaic's
    prng_seed takes at most 2 values): nb < 2^14 batch tiles (B ≤ 2M),
    fq < 2^8 query tiles (F ≤ 2048), h < 2^9 heads."""
    return (h * (1 << 22) + fq * (1 << 14) + nb).astype(jnp.int32) \
        if hasattr(h, "astype") else h * (1 << 22) + fq * (1 << 14) + nb


def _dropout_mask(shape, rate: float):
    """Multiplicative keep-mask from the seeded hardware PRNG (seed the
    per-core PRNG with ``pltpu.prng_seed`` BEFORE calling)."""
    bits = pltpu.prng_random_bits(shape)
    thresh = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    keep = bits.astype(jnp.uint32) >= thresh
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _scores(q_blk, k_blk, dh: int, scale: float, bias):
    """(fq_t, f_pad, bt) scaled scores from (dh, fq_t, bt) q / (dh, f_pad,
    bt) k — d_head unrolls as VPU broadcast-multiply adds."""
    s = q_blk[0][:, None, :] * k_blk[0][None, :, :]
    for d in range(1, dh):
        s += q_blk[d][:, None, :] * k_blk[d][None, :, :]
    s *= scale
    if bias is not None:
        s += bias
    return s


def _softmax_keys(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, dh, f, scale, rate):
    fq_t, f_pad, bt = q_ref.shape[2], k_ref.shape[2], q_ref.shape[3]
    h, nb, fq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]          # (dh, F*, bt)
    p = _softmax_keys(_scores(q, k, dh, scale,
                              _key_mask_bias(fq_t, f_pad, bt, f)))
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], _grid_salt(h, fq, nb))
        p = p * _dropout_mask(p.shape, rate)
    for d in range(dh):
        o_ref[0, d] = jnp.sum(p * v[d][None, :, :], axis=1)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, dh, f, scale, rate):
    fq_t, f_pad, bt = q_ref.shape[2], k_ref.shape[2], q_ref.shape[3]
    h, nb, fq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    p = _softmax_keys(_scores(q, k, dh, scale,
                              _key_mask_bias(fq_t, f_pad, bt, f)))
    if rate > 0.0:
        # the SAME seed tuple as forward -> the identical mask, regenerated
        pltpu.prng_seed(seed_ref[0], _grid_salt(h, fq, nb))
        mask = _dropout_mask(p.shape, rate)
        pd = p * mask
    else:
        pd = p

    # dv[d, fk, b] += sum_fq pd * do[d]        (accumulated over fq steps)
    # dp = (sum_d do[d] * v[d]) * mask          (grad w.r.t. pre-dropout p)
    dp = do[0][:, None, :] * v[0][None, :, :]
    for d in range(1, dh):
        dp += do[d][:, None, :] * v[d][None, :, :]
    if rate > 0.0:
        dp = dp * mask
    # softmax jacobian: ds = p * (dp - sum_fk dp*p)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    ds_scaled = ds * scale

    @pl.when(fq == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    for d in range(dh):
        dq_ref[0, d] = jnp.sum(ds_scaled * k[d][None, :, :], axis=1)
        dk_ref[0, d] += jnp.sum(ds_scaled * q[d][:, None, :], axis=0)
        dv_ref[0, d] += jnp.sum(pd * do[d][:, None, :], axis=0)


def _pad_fields(x, f_pad: int):
    f = x.shape[2]
    if f == f_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, f_pad - f), (0, 0)))


def _grid_shapes(h: int, dh: int, f: int, b: int):
    f_pad = -(-f // FQ_TILE) * FQ_TILE
    bt = BATCH_TILE
    grid = (h, b // bt, f_pad // FQ_TILE)
    return f_pad, bt, grid


def eligible(h: int, dh: int, f: int, b: int) -> bool:
    """Shapes the kernel supports: lanes-full batch tiles and a VMEM-sized
    working set (k/v/dk/dv blocks + three (FQ_TILE, F, Bt) score blocks)."""
    if b % BATCH_TILE:
        return False
    f_pad = -(-f // FQ_TILE) * FQ_TILE
    working = (4 * dh * f_pad * BATCH_TILE        # k, v, dk, dv blocks
               + 4 * dh * FQ_TILE * BATCH_TILE    # q, do, dq, o blocks
               + 4 * FQ_TILE * f_pad * BATCH_TILE) * 4   # p/dp/ds/bias
    return working <= _VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def field_attention(q, k, v, seed, rate: float = 0.0,
                    interpret: Optional[bool] = None):
    """softmax(q·k/√dh)·v over fields, batch-minor, optional in-kernel
    attention-weight dropout.

    q/k/v: (head, d_head, F, B) f32; seed: int32 scalar (ignored when
    ``rate == 0``); returns (head, d_head, F, B) f32.  Differentiable
    w.r.t. q/k/v (hand-written flash backward; dropout mask regenerated
    from the seed).  ``eligible()`` must hold.
    """
    o, _ = _field_attention_fwd(q, k, v, seed, rate, interpret)
    return o


def _call(kernel, out_shapes, q, k, v, extra, seed, rate, interpret):
    h, dh, f, b = q.shape
    f_pad, bt, grid = _grid_shapes(h, dh, f, b)
    qp = _pad_fields(q, f_pad)
    kp = _pad_fields(k, f_pad)
    vp = _pad_fields(v, f_pad)
    extras = [_pad_fields(x, f_pad) for x in extra]
    fq_spec = pl.BlockSpec((1, dh, FQ_TILE, bt), lambda h_, nb, fq: (h_, 0, fq, nb),
                           memory_space=pltpu.VMEM)
    fk_spec = pl.BlockSpec((1, dh, f_pad, bt), lambda h_, nb, fq: (h_, 0, 0, nb),
                           memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),     # seed
                fq_spec, fk_spec, fk_spec] + [fq_spec] * len(extras)
    out_specs = [fq_spec if s == "fq" else fk_spec for s in out_shapes]
    out_shape = [jax.ShapeDtypeStruct((h, dh, f_pad, b), jnp.float32)
                 for _ in out_shapes]
    if len(out_shape) == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    interp = interpret_mode() if interpret is None else interpret
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    return pl.pallas_call(
        functools.partial(kernel, dh=dh, f=f, scale=1.0 / (dh ** 0.5),
                          rate=rate),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interp,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * dh * f * f * b,
            bytes_accessed=4 * (3 + len(extras)) * h * dh * f * b,
            transcendentals=h * f * f * b),
    )(seed_arr, qp, kp, vp, *extras), f_pad


def _field_attention_fwd(q, k, v, seed, rate, interpret):
    f = q.shape[2]
    o, f_pad = _call(_fwd_kernel, ["fq"], q, k, v, [], seed, rate, interpret)
    if f_pad != f:
        o = o[:, :, :f, :]
    return o, (q, k, v, seed)


def _field_attention_bwd(rate, interpret, res, do):
    q, k, v, seed = res
    f = q.shape[2]
    (dq, dk, dv), f_pad = _call(_bwd_kernel, ["fq", "fk", "fk"], q, k, v,
                                [do], seed, rate, interpret)
    if f_pad != f:
        dq, dk, dv = (x[:, :, :f, :] for x in (dq, dk, dv))
    return dq, dk, dv, None


field_attention.defvjp(_field_attention_fwd, _field_attention_bwd)


def field_attention_reference(q, k, v, rate: float = 0.0, mask=None):
    """Pure-jnp oracle (dropout via an explicit multiplicative mask).
    HIGHEST-precision contractions: the TPU default runs f32 einsums in
    bf16 passes (~1e-2 error) — the KERNEL is exact f32 (all-VPU), so the
    oracle must be too (round-5 on-chip gate caught exactly this)."""
    h, dh, f, b = q.shape
    s = jnp.einsum("hdfb,hdgb->hfgb", q, k,
                   precision=jax.lax.Precision.HIGHEST) / (dh ** 0.5)
    p = jax.nn.softmax(s, axis=2)
    if rate > 0.0 and mask is not None:
        p = p * mask
    return jnp.einsum("hfgb,hdgb->hdfb", p, v,
                      precision=jax.lax.Precision.HIGHEST)
