"""AutoInt interacting layer (multi-head self-attention over fields).

Re-design of reference ``InteractingLayer.py:7-61`` (byte-identical copy at
``rank/multi_head/interacting_layer.py``).  Faithful semantics:

- ONE set of Q/K/V/res projections (relu-activated) shared across all
  ``layer_num`` stacked iterations (created once in ``__init__``,
  ``InteractingLayer.py:24-30``);
- head split via ``tf.split(axis=2)+concat(axis=0)`` == head-major fold into
  the batch dim (``:47-49``);
- scale by ``sqrt(d_head)`` (``:51``), softmax over keys, optional dropout on
  the attention weights (``:53-54``), residual + ReLU + LayerNorm (``:57-60``).

Dispatch: on TPU the per-iteration core runs as ONE fused Pallas kernel
(``kernels/interacting_pallas.py`` — projections + attention + residual +
LN in a single VMEM pass); elsewhere (or when attention dropout is active in
training) the identical math runs through XLA.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class InteractingLayer(nn.Module):
    layer_num: int = 1
    unit_num: int = 128
    head_num: int = 1
    use_dropout: bool = False
    dropout_rate: float = 0.3
    use_res: bool = True
    ln_epsilon: float = 1e-3   # Keras LayerNormalization default

    def _params(self, d: int) -> Dict[str, jnp.ndarray]:
        glorot = nn.initializers.glorot_uniform()
        zeros = nn.initializers.zeros_init()
        ones = nn.initializers.ones_init()
        u = self.unit_num
        p = {
            "wq": self.param("wq", glorot, (d, u)),
            "bq": self.param("bq", zeros, (u,)),
            "wk": self.param("wk", glorot, (d, u)),
            "bk": self.param("bk", zeros, (u,)),
            "wv": self.param("wv", glorot, (d, u)),
            "bv": self.param("bv", zeros, (u,)),
            "gamma": self.param("ln_scale", ones, (u,)),
            "beta": self.param("ln_bias", zeros, (u,)),
        }
        if self.use_res:
            p["wr"] = self.param("wr", glorot, (d, u))
            p["br"] = self.param("br", zeros, (u,))
        else:   # the fused kernel always applies a residual projection
            p["wr"] = jnp.zeros((d, u), jnp.float32)
            p["br"] = jnp.zeros((u,), jnp.float32)
        return p

    def _xla_iteration_t(self, x_t, p, training, dropout=None,
                         flash_seed=None):
        """One attention iteration in the fully-TRANSPOSED (d, field, B)
        layout — batch is the minor (lane) dim end-to-end.

        The head/field dims are tiny (F<=212, d_head<=8), so batched-dot
        einsums force XLA into (24, 24)-minor layouts that lane-pad and
        relayout between every op (~2.7 ms copies each at batch 64k, round-4
        op trace).  With batch minor, the projections are (U, d)@(d, F*B)
        MXU matmuls, the attention contractions are VPU broadcast-multiply-
        reduce fusions (exact f32 — the einsum form ran bf16 MXU passes),
        LayerNorm reduces over the LEADING u dim, and iterations chain
        without any per-iteration transpose: 3-iteration fwd+bwd at B=64k
        measured 53.6 -> 26.5 ms vs the per-iteration-transposed form and
        71.7 ms for the original einsum form (scripts/probe18-19.py; parity
        3.6e-7).  Math unchanged from reference ``InteractingLayer.py:41-60``.

        ``flash_seed`` not None selects the flash-style Pallas attention
        core (``kernels/field_attention_pallas.py``): the (head, F, F, B)
        score tensors stay in VMEM — at production field counts (F = 175)
        they are 2 GB EACH in HBM and dominated the step (round-5 trace) —
        and attention-weight dropout runs on the in-kernel hardware PRNG
        instead of a threefry program.
        """
        d, f, b = x_t.shape
        u = self.unit_num
        dh = u // self.head_num
        flat = x_t.reshape(d, f * b)

        def proj(wkey, bkey):                   # -> (head, d_head, field, B)
            z = jax.nn.relu(p[wkey].T @ flat + p[bkey][:, None])
            return z.reshape(self.head_num, dh, f, b)

        qt, kt, vt = proj("wq", "bq"), proj("wk", "bk"), proj("wv", "bv")
        if flash_seed is not None:
            from ..kernels.field_attention_pallas import field_attention
            rate = self.dropout_rate if (self.use_dropout and training) else 0.0
            o = field_attention(qt, kt, vt, flash_seed, rate)
            o = o.reshape(u, f, b)
        else:
            w = (qt[:, :, :, None, :] * kt[:, :, None, :, :]).sum(1) / (dh ** 0.5)
            w = jax.nn.softmax(w, axis=2)       # (head, f, g, B), keys on g
            if dropout is not None:
                w = dropout(w)
            o = (w[:, None, :, :, :] * vt[:, :, None, :, :]).sum(3)
            o = o.reshape(u, f, b)
        if self.use_res:
            rt = jax.nn.relu(p["wr"].T @ flat + p["br"][:, None])
            o = o + rt.reshape(u, f, b)
        o = jax.nn.relu(o)
        mu = jnp.mean(o, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(o - mu), axis=0, keepdims=True)
        return ((o - mu) * jax.lax.rsqrt(var + self.ln_epsilon)
                * p["gamma"][:, None, None] + p["beta"][:, None, None])

    def _xla_iteration(self, x, p, training, dropout=None):
        """(B, F, D) wrapper of the transposed iteration (used only on the
        mixed fused/XLA path; the all-XLA loop stays in T-space)."""
        out = self._xla_iteration_t(x.transpose(2, 1, 0), p, training, dropout)
        return out.transpose(2, 1, 0)

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        if inputs.ndim != 3:
            raise ValueError(
                "The rank of input of InteractingLayer must be 3, but now is %d" % inputs.ndim)
        if self.unit_num % self.head_num != 0:
            raise ValueError("unit_num must divide head_num")

        from ..kernels.flags import use_flash, use_pallas
        from ..kernels.field_attention_pallas import eligible
        from ..kernels.interacting_pallas import interacting_attention

        p = self._params(inputs.shape[-1])
        dropout = nn.Dropout(self.dropout_rate, deterministic=not training,
                             name="weight_dropout") if self.use_dropout else None
        b, f, _ = inputs.shape
        dh = self.unit_num // self.head_num
        flash = use_flash() and eligible(self.head_num, dh, f, b)
        # attention-weight dropout only exists on the XLA path; inference
        # (deterministic) can always take the fused kernel
        fused_ok = use_pallas() and not (self.use_dropout and training) \
            and self.use_res and not flash
        if not fused_ok:
            seeds = [None] * self.layer_num
            if flash:
                if self.use_dropout and training:
                    # one int32 seed per iteration; the kernel derives the
                    # per-(head, tile) streams and the backward regenerates
                    # the identical masks from the same seed
                    key = self.make_rng("dropout")
                    data = jax.random.key_data(key) \
                        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) \
                        else key
                    flat = data.reshape(-1)
                    base = (flat[0] ^ flat[-1]).astype(jnp.int32)
                    seeds = [base + jnp.int32(i) for i in range(self.layer_num)]
                else:
                    seeds = [jnp.int32(0)] * self.layer_num
            # all-XLA loop chains in the transposed (d, F, B) layout: ONE
            # entry + ONE exit transpose for the whole stack
            x_t = inputs.transpose(2, 1, 0)
            for i in range(self.layer_num):
                x_t = self._xla_iteration_t(x_t, p, training, dropout,
                                            flash_seed=seeds[i])
            return x_t.transpose(2, 1, 0)
        output = inputs
        for i in range(self.layer_num):
            if output.shape[-1] == p["wq"].shape[0]:
                output = interacting_attention(output, p, self.head_num,
                                               self.ln_epsilon)
            else:
                output = self._xla_iteration(output, p, training, dropout)
        return output
