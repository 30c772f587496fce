"""Packed (lane-dense) embedding fast path for TPU.

Replaces the classic two-stage lookup/update of ``EmbeddingFeatures`` with a
pipeline that never materializes an E-scale array with a narrow trailing dim
(XLA TPU tiles HBM arrays to (8,128), so an (E, 8) f32 array physically
occupies 16x its logical bytes — measured on chip, scripts/probe6.py):

  forward   wp    = reshape(w, (rows/Pg, Pg*D)) + lane pad      (pure reshape)
            wide  = take(wp, ids // Pg), promise_in_bounds (ids are
                    hash-bounded, so the gather skips the out-of-bounds
                    select pass XLA otherwise emits — 2 ms/storage on chip)
            out   = fold kernel: lane-select by ids % Pg (computed in-kernel
                    from the raw id stream — no precomputed lane bitmap),
                    summed over L (mean columns) or per-row (sequence
                    columns).  Mean streams are L-MAJOR per column (a
                    column's (B, L) ids transpose to (L, B) before
                    flattening): the (E, 128) wide stream then reshapes FREE
                    to (C, L, B, 128) — last-two dims (B, 128) tile cleanly —
                    and the fold kernel blocks it 4-D.  The earlier b-major
                    layout needed an (X, L, 128) view whose (L=5, 128)
                    trailing dims sublane-pad 5->8, a materializing ~2.7
                    ms/storage HBM relayout on each side of each kernel
                    (op-level trace, round 4).
  backward  (the model is differentiated w.r.t. the folded activations, which
            are X-scale, so autodiff never sees an E-scale array)
            pay   = unfold kernel (4-D blocks, same l-major layout): place
                    d/d(out) into [grad | count] lane groups of
                    Ps = 128 // (D+1) rows per 128-lane row, lane positions
                    computed in-kernel from ids % Ps
            G,cnt = one scatter-add per member table into a (rows/Ps, 128)
                    accumulator, unpacked by pure reshapes
            state = lazy dense per-row optimizer pass (HBM-bandwidth bound)

Headline effect (autoint, batch 64k, 24 x 265k x 8 tables, real v5e,
fetch-verified windows): 4142 ms/step (round-2 classic scatter) -> 402 ms
(dense-G scatter) -> ~290 ms (ohm-bitmap Pallas variant, superseded) ->
264.7 ms (b-major 3-D Pallas fold/unfold, BENCH_r03) -> ~220 ms for THIS
path (l-major 4-D kernels + promise_in_bounds gathers, round 4).

Gather locality: jnp.take from a <~40 MB target runs at 3.5 ns/id but jumps
to ~11.7 ns/id above ~128 MB (scripts: /tmp/takecurve), so storage grouping
is capped by ``max_group_bytes`` in the engine.

The Pallas kernels run only on TPU; everywhere else the pure-jnp reference
implementations below are used (same math, same layouts), so CPU tests pin
the pipeline shape and ``scripts/onchip_packed_parity.py`` checks
kernel-vs-reference on the real chip.  Selection matmuls run at HIGHEST
precision (the 0/1 fold matrices make them exact); the TPU default would
run f32 dots in bf16 passes and break parity with the classic paths.

Reference semantics preserved: mean combiner divides by live count
(``tn.feature_column.embedding_column(combiner='mean')``,
``rank/ctr/base_model.py:210-212``); sequence columns return (B, T, D) and a
mask (``staytime/VideoDnn.py:228-236``); the count column drives the 'show'
statistic and per-row lazy optimizer steps (``tn.core.AdaGrad
feature_drop_show``, ``rank/multi_head/multidnn.py:230-234``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

_LANES = 128


def gather_pack(d: int) -> int:
    """Rows per 128-lane physical row in the GATHER packing (pure reshape of
    the (rows, D) table; no count lane)."""
    return max(1, _LANES // d)


def scatter_pack(d: int) -> int:
    """Rows per 128-lane physical row in the SCATTER packing ([grad | count]
    groups of D+1 lanes)."""
    return max(1, _LANES // (d + 1))


def packable(d: int) -> bool:
    """Any dim whose [grad | count] group fits one 128-lane row packs
    (d <= 127).  Narrow dims (d <= 42) share >=2 logical rows per physical
    row in both packings — the big win vs the (8,128)-tile lane-pad tax;
    wide dims (43..127) degenerate to one row per physical row on one or
    both sides, which still beats the classic path's narrow-array grads and
    keeps every model on the same parity-locked code path (production ctr's
    96-wide shared rows: ``rank/ctr/base_model.py:82-86``)."""
    return d + 1 <= _LANES


# ---------------------------------------------------------------------------
# lane-map constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _lane_maps(d: int) -> Tuple[Any, Any, Any, Any, Any]:
    """(gather FOLD (128, D), scatter SFOLD (128, D), gather group-of-lane,
    scatter group-of-lane, scatter sub-of-lane) as numpy; jnp conversion
    happens at trace time.  FOLD selects gather lanes (groups of D); SFOLD
    selects scatter grad lanes (groups of D+1 — the [grad | count] layout),
    so unfold places grads at the SCATTER lane positions."""
    import numpy as np
    pg, ps = gather_pack(d), scatter_pack(d)
    ki = np.arange(_LANES)
    g_grp = np.where(ki < pg * d, ki // d, pg)
    g_sub = ki % d
    fold = ((g_sub[:, None] == np.arange(d)[None, :])
            & (ki[:, None] < pg * d)).astype(np.float32)
    s_grp = np.where(ki < ps * (d + 1), ki // (d + 1), ps)
    s_sub = ki % (d + 1)
    sfold = ((s_sub[:, None] == np.arange(d)[None, :])
             & (ki[:, None] < ps * (d + 1))).astype(np.float32)
    return fold, sfold, g_grp, s_grp, s_sub


def fold_matrix(d: int) -> jnp.ndarray:
    return jnp.asarray(_lane_maps(d)[0])


def scatter_fold_matrix(d: int) -> jnp.ndarray:
    return jnp.asarray(_lane_maps(d)[1])


def pack_table(w: jnp.ndarray) -> jnp.ndarray:
    """(rows, D) -> (rows/Pg, 128), a pure reshape plus lane pad in the
    table's own dtype (bf16 rows stay bf16 — half the gather bytes; fold
    kernels convert lanes to f32 at use).  rows must be a multiple of Pg
    (the engine pads table offsets accordingly)."""
    rows, d = w.shape
    pg = gather_pack(d)
    assert rows % pg == 0, (rows, pg)
    wp = w.reshape(rows // pg, pg * d)
    if pg * d < _LANES:
        wp = jnp.pad(wp, ((0, 0), (0, _LANES - pg * d)))
    return wp


def _dot_hi(a, b):
    """f32 matmul at HIGHEST precision: the TPU default runs f32 dots in
    bf16 passes (~1e-2 error); the 0/1 selection matrices here are exact at
    HIGHEST, keeping the packed path bit-comparable to the classic paths."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# fold / unfold — pure-jnp reference (CPU + test oracle)
# ---------------------------------------------------------------------------

def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _fold_consts(d: int, pack: str):
    """(rows-per-phys, lane->group map, (128, D) fold matrix) for folding
    out of either physical packing.  ``pack="gather"`` reads the pure-
    reshape (Pg rows of D lanes) packing; ``pack="scatter"`` reads the
    [value(D) | spare] (Ps rows of D+1 lanes) packing — the layout the
    packed-STATE tables live in (w's spare lane is unused; 'show'/t ride
    the f32 moment arrays' spares).  The scatter fold matrix maps no
    output column to the spare lane, so spare contents never leak into
    activations."""
    fold, sfold, g_grp, s_grp, _ = _lane_maps(d)
    if pack == "gather":
        return gather_pack(d), g_grp, fold
    return scatter_pack(d), s_grp, sfold


def _select(wide, ids, mask, d, pack: str = "gather"):
    """wide with only each row's lane group live: (E, 128)."""
    p, grp, _ = _fold_consts(d, pack)
    grp = jnp.asarray(grp, jnp.int32)
    sel = ((grp[None, :] == (ids % p).astype(jnp.int32)[:, None])
           & (mask > 0)[:, None])
    return jnp.where(sel, wide.astype(jnp.float32), 0.0)


def fold_mean_ref(wide, ids, mask, c: int, l: int, d: int,
                  pack: str = "gather") -> jnp.ndarray:
    """l-major (C*L*B, 128) wide rows (column-major; within a column, slot j
    of logical row b sits at j*B + b) -> (C*B, D) masked sums over L."""
    b = ids.shape[0] // (c * l)
    m = _select(wide, ids, mask, d, pack)
    s = m.reshape(c, l, b, _LANES).sum(1).reshape(c * b, _LANES)
    return _dot_hi(s, jnp.asarray(_fold_consts(d, pack)[2]))


def fold_rows_ref(wide, ids, mask, d: int, pack: str = "gather") -> jnp.ndarray:
    """(E, 128) wide rows -> (E, D) masked per-row values (seq columns)."""
    return _dot_hi(_select(wide, ids, mask, d, pack),
                   jnp.asarray(_fold_consts(d, pack)[2]))


def _scatter_lane_masks(ids, mask, d):
    """(E, 128) grad-lane / count-lane selectors from ids % Ps."""
    ps = scatter_pack(d)
    _, _, _, s_grp, s_sub = _lane_maps(d)
    s_grp = jnp.asarray(s_grp, jnp.int32)[None, :]
    s_sub = jnp.asarray(s_sub, jnp.int32)[None, :]
    ls = (ids % ps).astype(jnp.int32)[:, None]
    m = (mask > 0)[:, None]
    b1 = (s_grp == ls) & (s_sub < d) & m
    b2 = (s_grp == ls) & (s_sub == d) & m
    return b1, b2


def unfold_mean_ref(gx, ids, mask, c: int, l: int) -> jnp.ndarray:
    """(C*B, D) grads of the sums -> (C*L*B, 128) scatter payload (l-major),
    grads in this row's [grad] lanes, 1.0 count in its [count] lane."""
    x, d = gx.shape
    b = x // c
    b1, b2 = _scatter_lane_masks(ids, mask, d)
    gw = _dot_hi(gx, scatter_fold_matrix(d).T)       # (X, 128) broadcast lanes
    gr = jnp.broadcast_to(gw.reshape(c, 1, b, _LANES),
                          (c, l, b, _LANES)).reshape(c * l * b, _LANES)
    return gr * b1 + b2.astype(gw.dtype)


def unfold_rows_ref(g, ids, mask) -> jnp.ndarray:
    """(E, D) per-row grads -> (E, 128) scatter payload."""
    d = g.shape[1]
    b1, b2 = _scatter_lane_masks(ids, mask, d)
    gw = _dot_hi(g, scatter_fold_matrix(d).T)
    return gw * b1 + b2.astype(gw.dtype)


# ---------------------------------------------------------------------------
# fold / unfold — Pallas TPU kernels (lane select/reduce stays in VMEM; the
# best fused-XLA formulation materializes the select/reduce intermediates
# and costs ~5x more per storage — same-process phase A/B on chip)
# ---------------------------------------------------------------------------

def _chunk(x_rows: int, budget_rows: int = 2048):
    """Largest divisor of x_rows not exceeding the VMEM row budget; None if
    none qualifies (odd batch shapes fall back to jnp).  Mosaic requires a
    block's sublane dim be a multiple of 8 unless it equals the full array
    dim, so only 8-multiples (or x_rows itself) qualify."""
    c = min(x_rows, budget_rows)
    while c >= 8:
        if x_rows % c == 0 and (c % 8 == 0 or c == x_rows):
            return c
        c -= 1
    return None


def _chunk_l(b_rows: int, l: int, budget_rows: int):
    """Per-column chunk for the 4-D mean kernels: largest divisor of the
    column batch B with l * chunk within the VMEM row budget.  The chunk is
    the MINOR dim of the (1, l, chunk) id/mask blocks, so Mosaic requires it
    be a multiple of 128 — or the whole column (equal to the array dim)."""
    cap = max(1, budget_rows // max(1, l))
    if b_rows <= cap:
        return b_rows
    c = min(cap, b_rows) // 128 * 128
    while c >= 128:
        if b_rows % c == 0:
            return c
        c -= 128
    return None


def _lane_consts(d: int):
    """(1, 128) int32 lane->group / lane->sub maps for both packings."""
    _, _, g_grp, s_grp, s_sub = _lane_maps(d)
    return (jnp.asarray(g_grp, jnp.int32)[None, :],
            jnp.asarray(s_grp, jnp.int32)[None, :],
            jnp.asarray(s_sub, jnp.int32)[None, :])


def fold_mean(wide, ids, mask, c: int, l: int, d: int,
              pack: str = "gather") -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if l == 1:
        # single-id mean columns (the realistic VarLen common case) are
        # per-row folds; the 2-D kernel avoids degenerate-l blocks
        return fold_rows(wide, ids, mask, d, pack)
    b = ids.shape[0] // (c * l)
    # one grid step folds ALL l slots of a chunk of one column's logical
    # rows; the wide block is l*cx*512 B double-buffered, so l*cx caps at
    # ~5k rows within the 16 MB VMEM scoped limit
    cx = _chunk_l(b, l, 5120)
    if not on_tpu() or cx is None:
        return fold_mean_ref(wide, ids, mask, c, l, d, pack)
    p, grp, fmat = _fold_consts(d, pack)
    grp = jnp.asarray(grp, jnp.int32)[None, :]
    fmat = jnp.asarray(fmat)

    def kernel(w_ref, i_ref, m_ref, g_ref, f_ref, out_ref):
        # the (E, 128) wide stream reshapes FREE to (c, l, b, 128) (l-major
        # streams; last-two dims (b, 128) keep the flat tiling), so the only
        # relayout is the kernel-internal per-slot select/accumulate
        acc = jnp.zeros((cx, _LANES), jnp.float32)
        for j in range(l):
            lg = jax.lax.rem(i_ref[0, j, :], jnp.int32(p))[:, None]
            acc += (jnp.where(g_ref[:] == lg,
                              w_ref[0, j].astype(jnp.float32), 0.0)
                    * m_ref[0, j, :][:, None])
        out_ref[0] = jnp.dot(acc, f_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    out = pl.pallas_call(
        kernel, grid=(c, b // cx),
        in_specs=[pl.BlockSpec((1, l, cx, _LANES), lambda ci, i: (ci, 0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, l, cx), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, l, cx), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda ci, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_LANES, d), lambda ci, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, cx, d), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, b, d), jnp.float32),
    )(wide.reshape(c, l, b, _LANES), ids.reshape(c, l, b).astype(jnp.int32),
      mask.reshape(c, l, b), grp, fmat)
    return out.reshape(c * b, d)


def fold_rows(wide, ids, mask, d: int, pack: str = "gather") -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = ids.shape[0]
    c = _chunk(e)
    if not on_tpu() or c is None:
        return fold_rows_ref(wide, ids, mask, d, pack)
    p, grp, fmat = _fold_consts(d, pack)
    grp = jnp.asarray(grp, jnp.int32)[None, :]
    fmat = jnp.asarray(fmat)

    def kernel(w_ref, i_ref, m_ref, g_ref, f_ref, out_ref):
        lg = jax.lax.rem(i_ref[:], jnp.int32(p))             # (c, 1)
        m = (jnp.where(g_ref[:] == lg, w_ref[:].astype(jnp.float32), 0.0)
             * m_ref[:])                                     # (c, 128)
        out_ref[:] = jnp.dot(m, f_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kernel, grid=(e // c,),
        in_specs=[pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_LANES, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), jnp.float32),
    )(wide, ids[:, None].astype(jnp.int32), mask[:, None], grp, fmat)


def unfold_mean(gx, ids, mask, c: int, l: int) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if l == 1:
        return unfold_rows(gx, ids, mask)
    x, d = gx.shape
    b = x // c
    # tighter budget than the fold: the out block is the payload itself and
    # the surrounding step's scoped-vmem stack left <16 MB headroom (a
    # 5120-row budget overflowed by 0.5 MB inside the full jitted step)
    cx = _chunk_l(b, l, 3072)
    if not on_tpu() or cx is None:
        return unfold_mean_ref(gx, ids, mask, c, l)
    _, s_grp, s_sub = _lane_consts(d)
    ps = scatter_pack(d)

    def kernel(g_ref, i_ref, m_ref, sg_ref, ss_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[0], f_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)     # (cx, 128)
        is_g = jnp.where(ss_ref[:] < d, 1.0, 0.0)
        is_c = jnp.where(ss_ref[:] == d, 1.0, 0.0)
        for j in range(l):
            ls = jax.lax.rem(i_ref[0, j, :], jnp.int32(ps))[:, None]
            hit = (jnp.where(sg_ref[:] == ls, 1.0, 0.0)
                   * m_ref[0, j, :][:, None])                 # (cx, 128)
            out_ref[0, j] = hit * (gw * is_g + is_c)

    out = pl.pallas_call(
        kernel, grid=(c, b // cx),
        in_specs=[pl.BlockSpec((1, cx, d), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, l, cx), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, l, cx), lambda ci, i: (ci, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda ci, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda ci, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, _LANES), lambda ci, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, l, cx, _LANES), lambda ci, i: (ci, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, l, b, _LANES), jnp.float32),
    )(gx.reshape(c, b, d), ids.reshape(c, l, b).astype(jnp.int32),
      mask.reshape(c, l, b), s_grp, s_sub, scatter_fold_matrix(d).T)
    return out.reshape(c * l * b, _LANES)


def unfold_rows(g, ids, mask) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, d = g.shape
    c = _chunk(e)
    if not on_tpu() or c is None:
        return unfold_rows_ref(g, ids, mask)
    _, s_grp, s_sub = _lane_consts(d)
    ps = scatter_pack(d)

    def kernel(g_ref, i_ref, m_ref, sg_ref, ss_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[:], f_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)     # (c, 128)
        ls = jax.lax.rem(i_ref[:], jnp.int32(ps))             # (c, 1)
        hit = jnp.where(sg_ref[:] == ls, 1.0, 0.0) * m_ref[:]  # (c, 128)
        is_g = jnp.where(ss_ref[:] < d, 1.0, 0.0)
        is_c = jnp.where(ss_ref[:] == d, 1.0, 0.0)
        out_ref[:] = hit * (gw * is_g + is_c)

    return pl.pallas_call(
        kernel, grid=(e // c,),
        in_specs=[pl.BlockSpec((c, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, _LANES), jnp.float32),
    )(g, ids[:, None].astype(jnp.int32), mask[:, None], s_grp, s_sub,
      scatter_fold_matrix(d).T)


# ---------------------------------------------------------------------------
# storage-level plan + stage functions (driven by EmbeddingFeatures)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Segment:
    """One contiguous slice of a storage's flat id/wide stream.  Mean
    segments are L-MAJOR per column (a column's (B, L) ids transpose to
    (L, B) before flattening, so the (E, 128) wide stream reshapes free to
    (C, L, B, 128) for the 4-D kernels); seq segments stay b-major (their
    (B, T, D) output requires it).  Either way each column occupies one
    contiguous stream block, which is what ``table_spans`` relies on."""
    kind: str                # 'mean' or 'seq'
    keys: Tuple[str, ...]    # member columns (same L for 'mean')
    l: int                   # ids per example
    start: int               # row offset in the storage stream
    size: int                # number of stream rows (= X*l or B*T)


def plan_segments(eng, batch, storages=None) -> Dict[str, List[Segment]]:
    """Group each packed storage's present columns into fold-sized
    segments: mean columns bucketed by L (one fold_mean call per bucket,
    columns ordered table-major so each table's rows form L contiguous
    spans — see ``table_spans``), one seq segment per sequence column.
    ``storages``: optional set restricting the plan (the train step plans
    only the packable storages; the rest go through the classic path)."""
    plans: Dict[str, List[Segment]] = {}
    for skey, keys in eng._per_storage_columns(batch).items():
        if storages is not None and skey not in storages:
            continue
        segs: List[Segment] = []
        by_l: Dict[int, List[str]] = {}
        for key in keys:
            col = eng.columns[key]
            if col.is_sequence:
                continue
            by_l.setdefault(batch[key].rows.shape[1], []).append(key)
        off = 0
        for l, ks in sorted(by_l.items()):
            ks = sorted(ks, key=lambda k: (
                eng.table_map[eng.columns[k].categorical_column.key][1], k))
            size = sum(batch[k].rows.size for k in ks)
            segs.append(Segment("mean", tuple(ks), l, off, size))
            off += size
        for key in sorted(k for k in keys if eng.columns[k].is_sequence):
            size = batch[key].rows.size
            segs.append(Segment("seq", (key,), batch[key].rows.shape[1],
                                off, size))
            off += size
        plans[skey] = segs
    return plans


def table_spans(eng, segs: List[Segment], batch) -> Dict[str, List[Tuple[int, int]]]:
    """Static (start, size) spans of one storage's flat stream per member
    table.  Each column occupies one contiguous (B*L) block of the stream —
    true in both the historical b-major and the current l-major layouts,
    because only the ordering WITHIN a column's block changed (round 4);
    spans never straddle columns.  No production path calls this anymore
    (the per-column unfold feeds scatters directly); kept for tests and
    scripts/profile_packed.py."""
    spans: Dict[str, List[Tuple[int, int]]] = {}
    for seg in segs:
        off = seg.start
        runs: List[Tuple[str, int, int]] = []   # (tkey, start, size)
        for k in seg.keys:
            tkey = eng.columns[k].categorical_column.key
            n = batch[k].rows.size
            if runs and runs[-1][0] == tkey and \
                    runs[-1][1] + runs[-1][2] == off:
                runs[-1] = (tkey, runs[-1][1], runs[-1][2] + n)
            else:
                runs.append((tkey, off, n))
            off += n
        for tkey, start, size in runs:
            spans.setdefault(tkey, []).append((start, size))
    return spans


def storage_stream(eng, skey: str, segs: List[Segment], batch):
    """Flat (ids, mask) stream of one storage: columns concatenate in
    segment order, each column one contiguous block.  Mean columns flatten
    L-MAJOR ((B, L) -> transpose -> (L, B) -> flat; XLA lays (B, L) id
    arrays out column-major already, so the transpose is free); seq columns
    flatten b-major (their (B, T, D) output requires it)."""
    ids_parts, mask_parts = [], []
    for seg in segs:
        for k in seg.keys:
            rows = _offset_rows(eng, k, batch)
            m = batch[k].mask.astype(jnp.float32)
            if seg.kind == "mean":
                rows, m = rows.T, m.T
            ids_parts.append(rows.reshape(-1))
            mask_parts.append(m.reshape(-1))
    return jnp.concatenate(ids_parts), jnp.concatenate(mask_parts)


def _offset_rows(eng, key: str, batch):
    _, offset, _ = eng.table_map[eng.columns[key].categorical_column.key]
    rows = batch[key].rows
    return rows + offset if offset else rows


def _gather_layout(eng, skey, tables):
    """(physical array, rows-per-phys, fold pack name) of one storage's
    gather source: packed-STATE tables are already physical (scatter
    packing, spare = show); classic tables reshape to the gather packing.
    ``tables`` may be the engine state dict OR a bare {skey: (rows, D)}
    weights dict (legacy callers/probes)."""
    tstate = tables[skey]
    d = eng.storage[skey][1]
    if isinstance(tstate, dict):
        if is_packed_state(tstate):
            return tstate["w"], scatter_pack(d), "scatter"
        tstate = tstate["w"]
    return pack_table(tstate), gather_pack(d), "gather"


def gather_fold(eng, tables, batch, plans) -> Dict[str, Any]:
    """Stage 1 (NOT differentiated): packed gather + fold.  Returns, per
    storage, the folded activations {segment start -> array} plus the
    (ids, mask) needed by the scatter stage.  ``tables``: the engine state
    dict (layouts per ``_gather_layout``)."""
    out = {}
    for skey, segs in plans.items():
        d = eng.storage[skey][1]
        ids, mask = storage_stream(eng, skey, segs, batch)
        wp, p, pack = _gather_layout(eng, skey, tables)
        # ids are hash-bounded by construction; promising in-bounds drops
        # the out-of-bounds select pass XLA otherwise fuses after the
        # gather (~2 ms/storage on chip, op-level trace)
        wide = wp.at[ids // p].get(mode="promise_in_bounds")
        acts = []
        for seg in segs:
            w_seg = wide[seg.start:seg.start + seg.size]
            i_seg = ids[seg.start:seg.start + seg.size]
            m_seg = mask[seg.start:seg.start + seg.size]
            if seg.kind == "mean":
                acts.append(fold_mean(w_seg, i_seg, m_seg, len(seg.keys),
                                      seg.l, d, pack))
            else:
                acts.append(fold_rows(w_seg, i_seg, m_seg, d, pack))
        out[skey] = {"acts": acts, "ids": ids, "mask": mask}
    return out


def combine_from_acts(eng, plans, ctx, batch):
    """Stage 2 (differentiated w.r.t. ctx['acts']): per-column outputs with
    the classic combiner semantics."""
    outputs = {}
    for skey, segs in plans.items():
        for seg, act in zip(segs, ctx[skey]["acts"]):
            if seg.kind == "mean":
                x0 = 0
                for k in seg.keys:
                    b = batch[k].rows.shape[0]
                    sums = act[x0:x0 + b]
                    cnt = jnp.sum(batch[k].mask.astype(jnp.float32), axis=1,
                                  keepdims=True)
                    col = eng.columns[k]
                    if col.combiner == "sum":
                        outputs[k] = sums
                    elif col.combiner == "sqrtn":
                        outputs[k] = sums / jnp.sqrt(jnp.maximum(cnt, 1.0))
                    else:
                        outputs[k] = sums / jnp.maximum(cnt, 1.0)
                    x0 += b
            else:
                (k,) = seg.keys
                b, t = batch[k].rows.shape
                emb = act.reshape(b, t, -1)
                outputs[k] = (emb, batch[k].mask.astype(bool))
    return outputs


def apply_gradients_packed(eng, state, g_acts, plans, ctx, batch):
    """Stage 3 (NOT differentiated): unfold the activation grads into
    [grad | count] lane payloads and scatter-add them per member table
    (small targets are ~6x faster), then run the lazy dense optimizer pass
    (same update as the classic paths).

    Unfold runs PER COLUMN (each column is one contiguous stream block owned
    by exactly one table), so every payload feeds its scatter directly —
    slicing a multi-column payload for the per-table scatters materialized a
    0.5 ms copy per storage (round-4 op trace)."""
    new_state = dict(state)
    # O(touched-rows) selection: when the engine's TOTAL packed-state rows
    # exceed the crossover (the lazy pass streams w+m+v of EVERY storage,
    # so the aggregate is what costs), huge storages skip the dense
    # accumulator + lazy pass entirely (row_update_packed_storage);
    # below the crossover the lazy path wins (A/B: PROFILE_r05.md)
    total_pk_rows = sum(eng.storage[s][0] for s in plans
                        if is_packed_state(state[s]))
    rows_mode = total_pk_rows >= getattr(eng, "row_update_min_rows", 1 << 62)
    for skey, segs in plans.items():
        d = eng.storage[skey][1]
        ps = scatter_pack(d)
        ids, mask = ctx[skey]["ids"], ctx[skey]["mask"]
        tstate = state[skey]
        use_rows = rows_mode and is_packed_state(tstate)
        accs: Dict[str, Any] = {}
        row_parts: List[Tuple[Any, Any]] = []      # (storage phys, payload)

        def scatter_col(tkey, s0, n, pay):
            if use_rows:
                row_parts.append((ids[s0:s0 + n] // ps, pay))
                return
            _, off, rows_t = eng.table_map[tkey]
            np_t = -(-rows_t // ps)
            phys = (ids[s0:s0 + n] - off) // ps        # off % ps == 0
            acc = accs.get(tkey)
            if acc is None:
                acc = jnp.zeros((np_t, _LANES), jnp.float32)
            accs[tkey] = acc.at[phys].add(pay, mode="drop")

        for seg, g in zip(segs, g_acts[skey]):
            if seg.kind == "mean":
                c = len(seg.keys)
                b = seg.size // (c * seg.l)
                for ci, k in enumerate(seg.keys):
                    s0 = seg.start + ci * seg.l * b
                    pay = unfold_mean(g[ci * b:(ci + 1) * b],
                                      ids[s0:s0 + seg.l * b],
                                      mask[s0:s0 + seg.l * b], 1, seg.l)
                    scatter_col(eng.columns[k].categorical_column.key,
                                s0, seg.l * b, pay)
            else:
                (k,) = seg.keys
                pay = unfold_rows(g.reshape(seg.size, d),
                                  ids[seg.start:seg.start + seg.size],
                                  mask[seg.start:seg.start + seg.size])
                scatter_col(eng.columns[k].categorical_column.key,
                            seg.start, seg.size, pay)

        if use_rows:
            phys_all = (row_parts[0][0] if len(row_parts) == 1
                        else jnp.concatenate([p for p, _ in row_parts]))
            pay_all = (row_parts[0][1] if len(row_parts) == 1
                       else jnp.concatenate([p for _, p in row_parts]))
            new_state[skey] = row_update_packed_storage(
                eng.sparse_opt, tstate, phys_all, pay_all, d)
            continue
        if is_packed_state(tstate):
            # the accumulator IS the state layout: concat member accs into
            # one (rows/Ps, 128) [grad | count] array and run the one-pass
            # packed Adam — no unpack, no pack_table, no narrow arrays
            acc_parts = []
            for off, tkey, rows_t in eng._storage_members(skey):
                np_t = -(-rows_t // ps)
                acc_parts.append(accs.get(
                    tkey, jnp.zeros((np_t, _LANES), jnp.float32)))
            acc = acc_parts[0] if len(acc_parts) == 1 \
                else jnp.concatenate(acc_parts)
            new_state[skey] = packed_adam_update(eng.sparse_opt, tstate,
                                                 acc, d)
            continue
        g_parts, c_parts = [], []
        for off, tkey, rows_t in eng._storage_members(skey):
            lanes = ps * (d + 1)
            np_t = -(-rows_t // ps)
            if tkey in accs:
                flat = accs[tkey][:, :lanes].reshape(np_t * ps, d + 1)[:rows_t]
                g_parts.append(flat[:, :d])
                c_parts.append(flat[:, d:])
            else:
                g_parts.append(jnp.zeros((rows_t, d), jnp.float32))
                c_parts.append(jnp.zeros((rows_t, 1), jnp.float32))
        G = g_parts[0] if len(g_parts) == 1 else jnp.concatenate(g_parts)
        cnt = c_parts[0] if len(c_parts) == 1 else jnp.concatenate(c_parts)
        row_mask = (cnt > 0).astype(jnp.float32)
        w, opt = eng.sparse_opt.update(tstate["w"].astype(jnp.float32), G,
                                       tstate["opt"], row_mask)
        new_state[skey] = {"w": w.astype(tstate["w"].dtype), "opt": opt,
                           "show": tstate["show"] + cnt}
    return new_state


# ---------------------------------------------------------------------------
# sharded mode: packed physical rows ride the all-to-all
# ---------------------------------------------------------------------------
#
# The 512-B packed physical row is exactly the right transport granularity
# for the ICI exchange: the gather ships (rows/Pg, 128) rows by phys id
# (id // Pg) through the same fixed-capacity all-to-all as the classic
# sharded path, and the backward routes [grad | count] payload rows to the
# shard owning phys row id // Ps.  The engine aligns rows-per-shard to
# lcm(Pg, Ps) (``stride_of``), so a physical row never straddles shards and
# phys-row ownership equals row ownership.  Stage boundaries differ from the
# local path: the sharded forward returns PER-COLUMN folded activations
# (data-sharded leaves concatenate correctly across shards; the local path's
# per-segment acts would interleave shard-locally).

def fold_storage_cols(eng, skey, segs, batch, wide, ids, mask,
                      pack: str = "gather") -> Dict[str, Any]:
    """Per-column folded activations of one storage: mean columns -> (B, D)
    masked SUMS (combiner division happens in the differentiated combine
    stage); seq columns -> (B*T, D) per-row values."""
    d = eng.storage[skey][1]
    out = {}
    for seg in segs:
        w_seg = wide[seg.start:seg.start + seg.size]
        i_seg = ids[seg.start:seg.start + seg.size]
        m_seg = mask[seg.start:seg.start + seg.size]
        if seg.kind == "mean":
            c = len(seg.keys)
            b = seg.size // (c * seg.l)
            act = fold_mean(w_seg, i_seg, m_seg, c, seg.l, d, pack)
            for ci, k in enumerate(seg.keys):
                out[k] = act[ci * b:(ci + 1) * b]
        else:
            (k,) = seg.keys
            out[k] = fold_rows(w_seg, i_seg, m_seg, d, pack)
    return out


def combine_from_col_acts(eng, col_acts, batch):
    """Differentiated combine stage over per-column folded activations
    (classic combiner semantics, same math as ``combine_from_acts``)."""
    outputs = {}
    for k, act in col_acts.items():
        col = eng.columns[k]
        if col.is_sequence:
            b, t = batch[k].rows.shape
            outputs[k] = (act.reshape(b, t, -1), batch[k].mask.astype(bool))
            continue
        cnt = jnp.sum(batch[k].mask.astype(jnp.float32), axis=1, keepdims=True)
        if col.combiner == "sum":
            outputs[k] = act
        elif col.combiner == "sqrtn":
            outputs[k] = act / jnp.sqrt(jnp.maximum(cnt, 1.0))
        else:
            outputs[k] = act / jnp.maximum(cnt, 1.0)
    return outputs


def gather_fold_sharded(eng, tables, batch, mesh, storages, axis_name=None):
    """Stage 1 of the sharded packed path (NOT differentiated): inside
    shard_map, build local streams, exchange packed physical rows through
    the all-to-all (phys id = id // P against the local physical shard),
    fold locally.  Returns {column: acts} with data-sharded leaves.
    ``tables``: the engine state dict — packed-STATE storages exchange
    their stored (rows/Ps, 128) rows directly, classic storages reshape to
    the gather packing first."""
    from jax.sharding import PartitionSpec as P
    from ..core.mesh import DATA_AXIS
    from .engine import all_to_all_lookup
    axis_name = axis_name or DATA_AXIS

    plans_global = plan_segments(eng, batch, storages=storages)
    out_keys = [k for segs in plans_global.values()
                for seg in segs for k in seg.keys]
    raw_w = {skey: tables[skey]["w"] for skey in plans_global}
    layouts = {skey: is_packed_state(tables[skey]) for skey in plans_global}

    def local_fn(w, b):
        plans = plan_segments(eng, b, storages=storages)
        out = {}
        for skey, segs in plans.items():
            d = eng.storage[skey][1]
            if layouts[skey]:
                wp, p, pack = w[skey], scatter_pack(d), "scatter"
            else:
                wp, p, pack = pack_table(w[skey]), gather_pack(d), "gather"
            ids, mask = storage_stream(eng, skey, segs, b)
            # mask rides along: padded stream entries (id 0 -> phys row 0)
            # must not consume shard 0's bounded a2a capacity
            wide = all_to_all_lookup(wp, ids // p, axis_name,
                                     eng.a2a_capacity_factor, mask=mask)
            out.update(fold_storage_cols(eng, skey, segs, b, wide, ids, mask,
                                         pack))
        return out

    w_specs = jax.tree.map(lambda _: P(axis_name, None), raw_w)
    b_specs = jax.tree.map(lambda _: P(axis_name), batch)
    out_specs = {k: P(axis_name) for k in out_keys}
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(w_specs, b_specs),
                       out_specs=out_specs, check_vma=False)
    return fn(raw_w, batch)


def apply_gradients_packed_sharded(eng, state, g_cols, batch, mesh, storages,
                                   axis_name=None):
    """Stage 3 of the sharded packed path (NOT differentiated): per-column
    unfold into [grad | count] payload rows, route each 512-B payload row to
    the shard owning phys row id // Ps (the PS push at packed-row
    granularity), scatter-add into the local accumulator, unpack by pure
    reshape (rows-per-shard is Ps-aligned) and run the lazy dense optimizer
    pass on local rows."""
    from jax.sharding import PartitionSpec as P
    from ..core.mesh import DATA_AXIS
    from .engine import route_grads_to_owners
    axis_name = axis_name or DATA_AXIS

    def local_fn(tables, gc, b):
        plans = plan_segments(eng, b, storages=storages)
        new = dict(tables)
        for skey, segs in plans.items():
            d = eng.storage[skey][1]
            ps = scatter_pack(d)
            ids, mask = storage_stream(eng, skey, segs, b)
            pay_parts = []
            for seg in segs:
                i_seg = ids[seg.start:seg.start + seg.size]
                m_seg = mask[seg.start:seg.start + seg.size]
                if seg.kind == "mean":
                    c = len(seg.keys)
                    bl = seg.size // (c * seg.l)
                    for ci, k in enumerate(seg.keys):
                        o = ci * seg.l * bl
                        pay_parts.append(unfold_mean(
                            gc[k], i_seg[o:o + seg.l * bl],
                            m_seg[o:o + seg.l * bl], 1, seg.l))
                else:
                    (k,) = seg.keys
                    pay_parts.append(unfold_rows(
                        gc[k].reshape(seg.size, d), i_seg, m_seg))
            pay = pay_parts[0] if len(pay_parts) == 1 \
                else jnp.concatenate(pay_parts)
            tstate = tables[skey]
            if is_packed_state(tstate):
                np_local = tstate["w"].shape[0]
                r_rows, r_pay, r_mask = route_grads_to_owners(
                    ids // ps, pay, mask, np_local, axis_name,
                    eng.a2a_capacity_factor)
                acc = jnp.zeros((np_local, _LANES), jnp.float32)
                acc = acc.at[r_rows].add(r_pay, mode="drop")
                # the accumulator IS the state layout: one-pass packed Adam
                new[skey] = packed_adam_update(eng.sparse_opt, tstate, acc, d)
                continue
            rows_local = tstate["w"].shape[0]
            np_local = rows_local // ps
            r_rows, r_pay, r_mask = route_grads_to_owners(
                ids // ps, pay, mask, np_local, axis_name,
                eng.a2a_capacity_factor)
            acc = jnp.zeros((np_local, _LANES), jnp.float32)
            acc = acc.at[r_rows].add(r_pay, mode="drop")
            lanes = ps * (d + 1)
            flat = acc[:, :lanes].reshape(rows_local, d + 1)
            G, cnt = flat[:, :d], flat[:, d:]
            row_mask = (cnt > 0).astype(jnp.float32)
            w, opt = eng.sparse_opt.update(tstate["w"].astype(jnp.float32), G,
                                           tstate["opt"], row_mask)
            new[skey] = {"w": w.astype(tstate["w"].dtype), "opt": opt,
                         "show": tstate["show"] + cnt}
        return new

    t_specs = jax.tree.map(lambda _: P(axis_name, None), state)
    g_specs = jax.tree.map(lambda _: P(axis_name), g_cols)
    b_specs = jax.tree.map(lambda _: P(axis_name), batch)
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(t_specs, g_specs, b_specs),
                       out_specs=t_specs, check_vma=False)
    return fn(state, g_cols, batch)


def lookup_packed(eng, tables, batch) -> Dict[str, Any]:
    """Forward-only packed lookup (eval / predict / serving): packed gather
    + fold for packable storages, classic fused gather for the rest.  Same
    outputs as ``EmbeddingFeatures.lookup(mode='local')`` (tested); NOT
    differentiable w.r.t. the tables (the train step differentiates at the
    folded-activation level instead — see ``train/step.py::step_packed``).
    ``tables``: the engine state dict (packed-STATE storages gather their
    stored physical rows directly — serving never pays an unpack)."""
    pk, _ = storages_packed(eng)
    plans = plan_segments(eng, batch, storages=set(pk))
    ctx = gather_fold(eng, tables, batch, plans)
    out = combine_from_acts(eng, plans, ctx, batch)
    classic_batch = {
        k: v for k, v in batch.items()
        if k in eng.columns
        and eng.table_map[eng.columns[k].categorical_column.key][0]
        not in plans}
    if classic_batch:
        some = next(iter(tables.values()), None)
        weights = eng.weights(tables) if isinstance(some, dict) else tables
        out.update(eng.lookup(weights, classic_batch, mode="local"))
    return out


def storages_packed(eng) -> Tuple[List[str], List[str]]:
    """Split storages into (packed, classic) sets.  Packed requires: f32 or
    bf16 storage (bf16 lanes convert to f32 inside the fold kernels; grads,
    payloads and optimizer math stay f32 — same round-trip as the classic
    bf16 path), packable dim, and P-aligned table offsets (the engine aligns
    them when built with packing enabled)."""
    packed, classic = [], []
    for skey, (rows, d) in eng.storage.items():
        ok = (packable(d)
              and eng.storage_dtype(d) in (jnp.float32, jnp.bfloat16)
              and rows % gather_pack(d) == 0
              and all(off % gather_pack(d) == 0 and off % scatter_pack(d) == 0
                      for off, _, _ in eng._storage_members(skey)))
        (packed if ok else classic).append(skey)
    return packed, classic


# ---------------------------------------------------------------------------
# packed optimizer state — tables + Adam moments co-located in the scatter
# packing ((rows/Ps, 128) [value(D) | spare] lane groups)
# ---------------------------------------------------------------------------
#
# The classic state ({"w": (rows, D), "opt": {m, v, (rows, 1) t}, (rows, 1)
# show}) costs the step three extra passes the math never needed: the
# backward accumulator arrives ALREADY in the scatter packing ((rows/Ps,
# 128) [grad | count]), but the lazy optimizer ran in the (rows, D) layout,
# so every step paid acc->G unpack + pack_table (wide gather source) +
# dense passes over the NARROW (rows, 1) t/show arrays (an (N, 1) f32
# array occupies 128x its logical bytes under (8, 128) tiling).  Round-4
# profiling put those passes at ~25-28 ms of the 159 ms headline
# (PROFILE_r04.md "Remaining headroom" #1; parity pre-validated in
# scripts/probe12.py).
#
# The packed STATE layout stores, per qualifying storage:
#     w_p: (rows/Ps, 128)  [w_0..w_{D-1} | show] lane groups
#     m_p: (rows/Ps, 128)  [m_0..m_{D-1} | t]
#     v_p: (rows/Ps, 128)  [v_0..v_{D-1} | 0]
# so the forward gathers physical rows of w_p DIRECTLY (fold pack=
# "scatter" skips the spare lane), the backward scatter-adds into the same
# granularity, and ONE elementwise pass updates w/m/v/t/show in place —
# per-row scalars ride the spare lanes, broadcast to their group's lanes
# by one exact (128, 128) 0/1 matmul.
#
# Qualifying storages (``state_packable``): SparseAdam with f32 moments,
# f32 tables, packable dim, Ps-aligned rows and member offsets (the engine
# aligns both when built with packing enabled).  Everything else keeps the
# classic layout; the two coexist per storage within one step.

def state_packable(eng, skey) -> bool:
    from .optimizers import SparseAdam
    rows, d = eng.storage[skey]
    ps = scatter_pack(d)
    return (getattr(eng, "packed_state", True)
            and isinstance(eng.sparse_opt, SparseAdam)
            and eng.sparse_opt.state_dtype == jnp.float32
            and eng.storage_dtype(d) in (jnp.float32, jnp.bfloat16)
            and packable(d)
            and rows % ps == 0
            and all(off % ps == 0
                    for off, _, _ in eng._storage_members(skey)))


def is_packed_state(tstate) -> bool:
    """Schema sniff: packed-state entries have no 'show' key (it rides
    v's spare lane) and name their moments m_p/v_p."""
    return "show" not in tstate


@functools.lru_cache(maxsize=None)
def _state_lane_consts(d: int):
    """(IS_W, IS_T, BC) as numpy: value-lane / spare-lane 0/1 selectors and
    the (128, 128) spare-lane -> group-lanes broadcast matrix."""
    import numpy as np
    ps = scatter_pack(d)
    ki = np.arange(_LANES)
    grp, sub = ki // (d + 1), ki % (d + 1)
    live = ki < ps * (d + 1)
    is_w = ((sub < d) & live).astype(np.float32)
    is_t = ((sub == d) & live).astype(np.float32)
    bc = ((grp[:, None] == grp[None, :]) & (sub[:, None] == d)
          & live[:, None] & live[None, :]).astype(np.float32)
    return is_w, is_t, bc


@functools.lru_cache(maxsize=None)
def _group_masks(d: int):
    """Per-group (128,) 0/1 lane masks: mask[g] is 1 on the live lanes of
    lane group g (used to broadcast a group's spare-lane scalar to its
    lanes with Ps column multiply-adds instead of a (128, 128) matmul)."""
    import numpy as np
    ps = scatter_pack(d)
    ki = np.arange(_LANES)
    grp = ki // (d + 1)
    live = ki < ps * (d + 1)
    return tuple(((grp == g) & live).astype(np.float32) for g in range(ps))


def _pack_cols(a, scalar, d: int):
    """(rows, D) [+ (rows, 1) scalar] -> (rows/Ps, 128) lane groups."""
    rows = a.shape[0]
    ps = scatter_pack(d)
    if scalar is None:
        scalar = jnp.zeros((rows, 1), a.dtype)
    grouped = jnp.concatenate([a, scalar], axis=1).reshape(
        rows // ps, ps * (d + 1))
    if ps * (d + 1) < _LANES:
        grouped = jnp.pad(grouped, ((0, 0), (0, _LANES - ps * (d + 1))))
    return grouped


def _unpack_cols(p, d: int):
    """(rows/Ps, 128) -> ((rows, D), (rows, 1) spare)."""
    ps = scatter_pack(d)
    flat = p[:, :ps * (d + 1)].reshape(p.shape[0] * ps, d + 1)
    return flat[:, :d], flat[:, d:]


def pack_state_entry(tstate, d: int):
    """Classic {"w", "opt": {m, v, t}, "show"} -> packed {"w", "opt":
    {"m_p", "v_p"}}.  w keeps its storage dtype (bf16 tables pack bf16 —
    half the gather bytes — which is why the per-row count spares live on
    the f32 moment arrays: t on m's spare, show on v's; counts cannot
    survive bf16 past 256)."""
    return {
        "w": _pack_cols(tstate["w"], None, d),
        "opt": {
            "m_p": _pack_cols(tstate["opt"]["m"].astype(jnp.float32),
                              tstate["opt"]["t"], d),
            "v_p": _pack_cols(tstate["opt"]["v"].astype(jnp.float32),
                              tstate["show"], d),
        },
    }


def unpack_state_entry(tstate, d: int):
    """Inverse of ``pack_state_entry``."""
    w, _ = _unpack_cols(tstate["w"], d)
    m, t = _unpack_cols(tstate["opt"]["m_p"], d)
    v, show = _unpack_cols(tstate["opt"]["v_p"], d)
    return {"w": w, "opt": {"m": m, "v": v, "t": t}, "show": show}


def unpack_w(wp, d: int):
    """(rows/Ps, 128) packed-state table -> (rows, D) weights view (a real
    copy: the spare lanes interleave)."""
    return _unpack_cols(wp, d)[0]


def packed_state_init(eng, rng, skey):
    """Same weight draw as the classic init for the same rng (cross-layout
    reproducibility: an engine with packed_state on/off starts identical)."""
    rows, d = eng.storage[skey]
    w = eng.sparse_opt.table_init(rng, (rows, d),
                                  dtype=eng.storage_dtype(d))
    zeros = jnp.zeros((rows, d), jnp.float32)
    return {
        "w": _pack_cols(w, None, d),
        "opt": {"m_p": _pack_cols(zeros, None, d),
                "v_p": _pack_cols(zeros, None, d)},
    }


def packed_adam_update(opt, tstate, acc, d: int):
    """The probe12-validated one-pass lazy Adam in the packed layout.

    ``acc``: (rows/Ps, 128) [grad | count] accumulator from the backward
    scatter.  Updates w/m/v on value lanes and t (m spare) / show (v spare)
    on spare lanes; untouched rows (count 0) pass through unchanged —
    identical per-row semantics to ``SparseAdam.update`` (parity-locked in
    tests).  Arithmetic f32 (bf16 tables round-trip through bf16 on write,
    the classic bf16 contract); the spare-lane broadcast is one exact
    (128, 128) 0/1 matmul at HIGHEST precision (or a column slice at
    Ps = 1)."""
    is_w, is_t, bc = _state_lane_consts(d)
    IS_W, IS_T, BC = (jnp.asarray(x) for x in (is_w, is_t, bc))
    wp, mp, vp = tstate["w"], tstate["opt"]["m_p"], tstate["opt"]["v_p"]
    wf = wp.astype(jnp.float32)
    b1, b2 = opt.beta1, opt.beta2
    cnt_l = acc * IS_T                              # counts at spare lanes
    ps = scatter_pack(d)
    if ps == 1:
        # wide dims (d >= 64): one logical row per 128-lane row, so the
        # spare lane is just column d and broadcasts implicitly — no
        # spread at all.  (scripts/probe22.py, parity 0.0.)
        cnt_col = acc[:, d:d + 1]
        live = cnt_col > 0
        t_new = (mp[:, d:d + 1]
                 + live.astype(jnp.float32)) * IS_T  # t at lane d
        t128 = jnp.maximum(mp[:, d:d + 1] + live.astype(jnp.float32), 1.0)
    elif ps <= 4:
        # few-group dims (25 <= d <= 63): spare-lane -> group-lanes
        # broadcast as Ps fused column multiply-adds instead of a
        # (128, 128) HIGHEST matmul — the matmul does 128 MACs/lane where
        # Ps suffice.  At d=48 (Ps=2, 3.2M phys rows) the matmuls were
        # 29 ms of the ctr step; the column form took the step 154.0 ->
        # 141.9 ms.  At LARGE Ps the unrolled columns lose to the matmul
        # (d=8/Ps=14 measured +20 ms on multi_head), hence the gate.
        masks = [jnp.asarray(m) for m in _group_masks(d)]

        def spread(cols):
            out = cols[0] * masks[0]
            for gi in range(1, ps):
                out = out + cols[gi] * masks[gi]
            return out

        def spares(p128):
            return [p128[:, gi * (d + 1) + d: gi * (d + 1) + d + 1]
                    for gi in range(ps)]

        cnt_cols = spares(acc)
        live = spread(cnt_cols) > 0                  # count > 0, per group
        t_new = mp * IS_T + (cnt_l > 0).astype(jnp.float32)
        t128 = jnp.maximum(spread(
            [t + (c > 0).astype(jnp.float32)
             for t, c in zip(spares(mp), cnt_cols)]), 1.0)
    else:
        live = _dot_hi(cnt_l, BC) > 0               # count > 0, per group
        t_new = mp * IS_T + (cnt_l > 0).astype(jnp.float32)
        t128 = jnp.maximum(_dot_hi(t_new, BC), 1.0)  # per-lane t, >= 1
    g = acc * IS_W
    m_new = jnp.where(live, b1 * mp + (1 - b1) * g, mp) * IS_W
    v_new = jnp.where(live, b2 * vp + (1 - b2) * jnp.square(g), vp) * IS_W
    m_hat = m_new / (1 - b1 ** t128)
    v_hat = v_new / (1 - b2 ** t128)
    step = opt.learning_rate * m_hat / (jnp.sqrt(v_hat) + opt.epsilon)
    w_new = (jnp.where(live, wf - step, wf) * IS_W   # update value lanes
             ).astype(wp.dtype)
    v_out = v_new + vp * IS_T + cnt_l                # show += count
    return {"w": w_new, "opt": {"m_p": m_new + t_new, "v_p": v_out}}


# ---------------------------------------------------------------------------
# O(touched-rows) optimizer variant for huge tables
# ---------------------------------------------------------------------------
#
# The lazy dense optimizer pass is O(table): at production table sizes
# (24 x 4M x 8 = 96M rows, ~10 GB of w/m/v per step) it dominates the step
# (~500 ms at batch 32768, SWEEP_r04_predict.log) even though only O(batch)
# rows actually move — tensornet's PS push updates only pushed rows
# (``tn.layers.EmbeddingFeatures``, ``rank/ctr/base_model.py:216``).  This
# variant restores that asymptotic: sort the payload rows by physical id,
# segment-sum duplicates, then gather/update/scatter-back ONLY the unique
# touched physical rows.  Costs O(E log E + U) per-row ops instead of
# O(table) streaming; the measured crossover on this platform is recorded
# in PROFILE_r05.md and drives ``row_update_min_rows`` below.

def row_update_packed_storage(opt, tstate, phys, pay, d: int):
    """One storage's packed-state update touching only unique phys rows.

    ``phys``: (E,) storage-level physical row ids (id // Ps, offsets are
    Ps-aligned); ``pay``: (E, 128) [grad | count] payload rows (masked
    entries carry zeros).  Equals the lazy ``packed_adam_update`` for
    touched rows and leaves untouched rows bit-identical (tested)."""
    e = phys.shape[0]
    np_rows = tstate["w"].shape[0]
    order = jnp.argsort(phys)
    sp = jnp.take(phys, order)
    spay = jnp.take(pay, order, axis=0)
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    seg_ids = jnp.cumsum(new_seg.astype(jnp.int32)) - 1              # (E,)
    acc = jax.ops.segment_sum(spay, seg_ids, num_segments=e)         # (E,128)
    uniq = jax.ops.segment_max(sp, seg_ids, num_segments=e)          # (E,)
    valid = jnp.arange(e) < (seg_ids[-1] + 1)
    # invalid tail segments: out-of-range target -> gathers clip (values
    # unused: count 0 -> passthrough), writes drop
    uniq = jnp.where(valid, uniq, np_rows)
    rows = {
        "w": tstate["w"].at[uniq].get(mode="clip"),
        "opt": {"m_p": tstate["opt"]["m_p"].at[uniq].get(mode="clip"),
                "v_p": tstate["opt"]["v_p"].at[uniq].get(mode="clip")},
    }
    upd = packed_adam_update(opt, rows, acc, d)
    return {
        "w": tstate["w"].at[uniq].set(upd["w"], mode="drop"),
        "opt": {
            "m_p": tstate["opt"]["m_p"].at[uniq].set(upd["opt"]["m_p"],
                                                     mode="drop"),
            "v_p": tstate["opt"]["v_p"].at[uniq].set(upd["opt"]["v_p"],
                                                     mode="drop"),
        },
    }
