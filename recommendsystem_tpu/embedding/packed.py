"""Packed (lane-dense) embedding fast path for TPU.

Replaces the classic two-stage lookup/update of ``EmbeddingFeatures`` with a
pipeline that never materializes an E-scale array with a narrow trailing dim
(XLA TPU tiles HBM arrays to (8,128), so an (E, 8) f32 array physically
occupies 16x its logical bytes — measured on chip, scripts/probe6.py):

  forward   wp    = reshape(w, (rows/Pg, Pg*D)) + lane pad      (pure reshape)
            wide  = take(wp, ids // Pg)                          (~3.5 ns/id)
            out   = fold kernel: lane-select by ids % Pg, sum over L (mean
                    columns, l-major stream) or per-row (sequence columns)
  backward  (the model is differentiated w.r.t. the folded activations, which
            are X-scale, so autodiff never sees an E-scale array)
            pay   = unfold kernel: place d/d(out) into [grad | count] lane
                    groups of Ps = 128 // (D+1) rows per 128-lane row
            G,cnt = one scatter-add per member table into a (rows/Ps, 128)
                    accumulator, unpacked by pure reshapes
            state = lazy dense per-row optimizer pass (HBM-bandwidth bound)

Headline effect (autoint, batch 64k, 24 x 265k x 8 tables, real v5e):
4142 ms/step (round-2) -> 402 ms (dense-G scatter) -> ~200 ms (this path).

Gather locality: jnp.take from a <~40 MB target runs at 3.5 ns/id but jumps
to ~11.7 ns/id above ~128 MB (scripts: /tmp/takecurve), so storage grouping
is capped by ``max_group_bytes`` in the engine.

The Pallas kernels run only on TPU; everywhere else the pure-jnp reference
implementations below are used (same math, same layouts), so CPU tests
exercise the identical code path shape.

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
from typing import Any, Dict, List, Optional, Tuple

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
    """The packed path pays when >=2 logical rows share a physical row in
    both packings."""
    return gather_pack(d) >= 2 and scatter_pack(d) >= 2


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# lane-map constants and ohm (one-hot-mask) build
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


def build_ohm(ids: jnp.ndarray, mask: jnp.ndarray, d: int) -> jnp.ndarray:
    """(E,) ids + (E,) mask -> (E, 128) uint8 lane-role bitmap.

    bit0: gather lane of this row's group (lane = (id % Pg)*D + sub), masked
    bit1: scatter grad lane ((id % Ps)*(D+1) + sub, sub < D), masked
    bit2: scatter count lane ((id % Ps)*(D+1) + D), masked
    """
    _, _, g_grp, s_grp, s_sub = _lane_maps(d)
    g_grp = jnp.asarray(g_grp, jnp.int32)[None, :]
    s_grp = jnp.asarray(s_grp, jnp.int32)[None, :]
    s_sub = jnp.asarray(s_sub, jnp.int32)[None, :]
    pg, ps = gather_pack(d), scatter_pack(d)
    lg = (ids % pg).astype(jnp.int32)[:, None]
    ls = (ids % ps).astype(jnp.int32)[:, None]
    m = (mask > 0)[:, None]
    b0 = (g_grp == lg) & m
    b1 = (s_grp == ls) & (s_sub < d) & m
    b2 = (s_grp == ls) & (s_sub == d) & m
    return (jnp.where(b0, 1, 0) + jnp.where(b1, 2, 0)
            + jnp.where(b2, 4, 0)).astype(jnp.uint8)


def fold_matrix(d: int) -> jnp.ndarray:
    return jnp.asarray(_lane_maps(d)[0])


def scatter_fold_matrix(d: int) -> jnp.ndarray:
    return jnp.asarray(_lane_maps(d)[1])


def pack_table(w: jnp.ndarray) -> jnp.ndarray:
    """(rows, D) -> (rows/Pg, 128), a pure reshape plus lane pad.  rows must
    be a multiple of Pg (the engine pads table offsets accordingly)."""
    rows, d = w.shape
    pg = gather_pack(d)
    assert rows % pg == 0, (rows, pg)
    wp = w.reshape(rows // pg, pg * d)
    if pg * d < _LANES:
        wp = jnp.pad(wp, ((0, 0), (0, _LANES - pg * d)))
    return wp


# ---------------------------------------------------------------------------
# reference (pure jnp) fold / unfold — used on CPU and as the test oracle
# ---------------------------------------------------------------------------

def _dot_hi(a, b):
    """f32 matmul at HIGHEST precision: the TPU default runs f32 dots in
    bf16 passes (~1e-2 error), which would break kernel-vs-reference parity
    (the Pallas kernels always use HIGHEST)."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def fold_mean_ref(wide: jnp.ndarray, ohm: jnp.ndarray, l: int, d: int
                  ) -> jnp.ndarray:
    """l-major (X*L, 128) wide rows -> (X, D) masked sums over L."""
    x = wide.shape[0] // l
    m = jnp.where((ohm & 1) != 0, wide, 0.0)
    s = m.reshape(l, x, _LANES).sum(0)
    return _dot_hi(s, fold_matrix(d))


def fold_rows_ref(wide: jnp.ndarray, ohm: jnp.ndarray, d: int) -> jnp.ndarray:
    """(E, 128) wide rows -> (E, D) masked per-row values."""
    m = jnp.where((ohm & 1) != 0, wide, 0.0)
    return _dot_hi(m, fold_matrix(d))


def unfold_mean_ref(gx: jnp.ndarray, ohm: jnp.ndarray, l: int) -> jnp.ndarray:
    """(X, D) grads of the sums -> (X*L, 128) scatter payload (l-major),
    grads in bit1 lanes, counts (1.0 per live slot) in bit2 lanes."""
    d = gx.shape[1]
    gw = _dot_hi(gx, scatter_fold_matrix(d).T)       # (X, 128) broadcast lanes
    gr = jnp.tile(gw, (l, 1))
    return (gr * ((ohm & 2) != 0) + ((ohm & 4) != 0).astype(gw.dtype))


def unfold_rows_ref(g: jnp.ndarray, ohm: jnp.ndarray) -> jnp.ndarray:
    """(E, D) per-row grads -> (E, 128) scatter payload."""
    d = g.shape[1]
    gw = _dot_hi(g, scatter_fold_matrix(d).T)
    return (gw * ((ohm & 2) != 0) + ((ohm & 4) != 0).astype(gw.dtype))


# ---------------------------------------------------------------------------
# Pallas kernels (TPU)
# ---------------------------------------------------------------------------

def _chunk(x_rows: int, budget_rows: int = 2048) -> Optional[int]:
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


def fold_mean_tpu(wide, ohm, l: int, d: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = wide.shape[0] // l
    # 3-D blocks: one grid step folds ALL l slots of a chunk (measured ~20%
    # faster than revisiting the output block l times with a VMEM scratch
    # accumulator — scripts/probe10.py).  VMEM budget caps l*cx: the wide
    # block is l*cx*512 B double-buffered, so l*cx > ~6k overflows the 16MB
    # scoped limit (l=1, cx=8192 OOM'd by 2.8MB on chip).
    cx3 = _chunk(x, budget_rows=max(256, 5120 // max(1, l)))
    if not on_tpu():
        return fold_mean_ref(wide, ohm, l, d)
    fold = fold_matrix(d)
    if cx3 is not None:
        nb = x // cx3

        def kernel3(w_ref, o_ref, f_ref, out_ref):
            m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)   # (l, cx, 128)
            out_ref[:] = jnp.dot(m.sum(axis=0), f_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        return pl.pallas_call(
            kernel3, grid=(nb,),
            in_specs=[pl.BlockSpec((l, cx3, _LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((l, cx3, _LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((_LANES, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((cx3, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((x, d), jnp.float32),
        )(wide.reshape(l, x, _LANES), ohm.reshape(l, x, _LANES), fold)

    cx = _chunk(x)
    if cx is None:
        return fold_mean_ref(wide, ohm, l, d)
    nb = x // cx

    def kernel(w_ref, o_ref, f_ref, out_ref, acc):
        li = pl.program_id(1)
        m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)
        @pl.when(li == 0)
        def _():
            acc[:] = m
        @pl.when(li > 0)
        def _():
            acc[:] += m
        @pl.when(li == l - 1)
        def _():
            out_ref[:] = jnp.dot(acc[:], f_ref[:],
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kernel, grid=(nb, l),
        in_specs=[pl.BlockSpec((cx, _LANES), lambda i, li: (li * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cx, _LANES), lambda i, li: (li * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_LANES, d), lambda i, li: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cx, d), lambda i, li: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cx, _LANES), jnp.float32)],
    )(wide, ohm, fold)


def fold_rows_tpu(wide, ohm, d: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e = wide.shape[0]
    c = _chunk(e)
    if c is None or not on_tpu():
        return fold_rows_ref(wide, ohm, d)
    fold = fold_matrix(d)

    def kernel(w_ref, o_ref, f_ref, out_ref):
        m = jnp.where((o_ref[:] & 1) != 0, w_ref[:], 0.0)
        out_ref[:] = jnp.dot(m, f_ref[:], preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    return pl.pallas_call(
        kernel, grid=(e // c,),
        in_specs=[pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_LANES, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, d), jnp.float32),
    )(wide, ohm, fold)


def unfold_mean_tpu(gx, ohm, l: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x, d = gx.shape
    if not on_tpu():
        return unfold_mean_ref(gx, ohm, l)
    foldt = scatter_fold_matrix(d).T
    # 3-D blocks: one grid step emits all l payload slots of a chunk from one
    # lane-broadcast matmul (scripts/probe10.py).  Same l*cx VMEM cap as
    # fold_mean_tpu (the f32 payload block dominates).
    cx3 = _chunk(x, budget_rows=max(256, 5120 // max(1, l)))
    if cx3 is not None:
        nb = x // cx3

        def kernel3(g_ref, o_ref, f_ref, out_ref):
            gw = jnp.dot(g_ref[:], f_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)   # (cx, 128)
            o = o_ref[:].astype(jnp.int32)                       # (l, cx, 128)
            out_ref[:] = (gw[None] * ((o >> 1) & 1).astype(jnp.float32)
                          + ((o >> 2) & 1).astype(jnp.float32))

        out = pl.pallas_call(
            kernel3, grid=(nb,),
            in_specs=[pl.BlockSpec((cx3, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((l, cx3, _LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((d, _LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((l, cx3, _LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((l, x, _LANES), jnp.float32),
        )(gx, ohm.reshape(l, x, _LANES), foldt)
        return out.reshape(x * l, _LANES)

    cx = _chunk(x)
    if cx is None:
        return unfold_mean_ref(gx, ohm, l)
    nb = x // cx

    def kernel(g_ref, o_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        o = o_ref[:].astype(jnp.int32)
        out_ref[:] = (gw * ((o >> 1) & 1).astype(jnp.float32)
                      + ((o >> 2) & 1).astype(jnp.float32))

    return pl.pallas_call(
        kernel, grid=(nb, l),
        in_specs=[pl.BlockSpec((cx, d), lambda i, li: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((cx, _LANES), lambda i, li: (li * nb + i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, _LANES), lambda i, li: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cx, _LANES), lambda i, li: (li * nb + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x * l, _LANES), jnp.float32),
    )(gx, ohm, foldt)


def unfold_rows_tpu(g, ohm):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, d = g.shape
    c = _chunk(e)
    if c is None or not on_tpu():
        return unfold_rows_ref(g, ohm)
    foldt = scatter_fold_matrix(d).T

    def kernel(g_ref, o_ref, f_ref, out_ref):
        gw = jnp.dot(g_ref[:], f_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        o = o_ref[:].astype(jnp.int32)
        out_ref[:] = (gw * ((o >> 1) & 1).astype(jnp.float32)
                      + ((o >> 2) & 1).astype(jnp.float32))

    return pl.pallas_call(
        kernel, grid=(e // c,),
        in_specs=[pl.BlockSpec((c, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((d, _LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, _LANES), jnp.float32),
    )(g, ohm, foldt)


# ---------------------------------------------------------------------------
# storage-level plan + stage functions (driven by EmbeddingFeatures)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Segment:
    """One contiguous slice of a storage's flat id/wide stream."""
    kind: str                # 'mean' (l-major) or 'seq' (b-major)
    keys: Tuple[str, ...]    # member columns (same L for 'mean')
    l: int                   # ids per example
    start: int               # row offset in the storage stream
    size: int                # number of stream rows (= X*l or B*T)


def plan_segments(eng, batch, storages=None) -> Dict[str, List[Segment]]:
    """Group each packed storage's present columns into kernel-sized
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
    table.  A mean bucket is l-major over its column-concat axis, so one
    table's columns occupy L contiguous spans; a seq segment is one span."""
    spans: Dict[str, List[Tuple[int, int]]] = {}
    for seg in segs:
        if seg.kind == "mean":
            # column-concat axis layout: row = l*XB + (col offset) + b
            xb = seg.size // seg.l
            col_off = 0
            runs: List[Tuple[str, int, int]] = []   # (tkey, off, width)
            for k in seg.keys:
                tkey = eng.columns[k].categorical_column.key
                b = batch[k].rows.shape[0]
                if runs and runs[-1][0] == tkey and \
                        runs[-1][1] + runs[-1][2] == col_off:
                    runs[-1] = (tkey, runs[-1][1], runs[-1][2] + b)
                else:
                    runs.append((tkey, col_off, b))
                col_off += b
            for tkey, off, width in runs:
                for l in range(seg.l):
                    spans.setdefault(tkey, []).append(
                        (seg.start + l * xb + off, width))
        else:
            (k,) = seg.keys
            tkey = eng.columns[k].categorical_column.key
            spans.setdefault(tkey, []).append((seg.start, seg.size))
    return spans


def storage_stream(eng, skey: str, segs: List[Segment], batch):
    """Flat (ids, mask) stream of one storage: mean segments l-major
    (transpose each column's (B, L) to (L, B) and concatenate columns along
    B so one kernel call covers the whole bucket), seq segments b-major."""
    ids_parts, mask_parts = [], []
    for seg in segs:
        if seg.kind == "mean":
            ids = jnp.concatenate(
                [_offset_rows(eng, k, batch).T for k in seg.keys], axis=1)
            msk = jnp.concatenate(
                [batch[k].mask.T for k in seg.keys], axis=1)
        else:
            (k,) = seg.keys
            ids = _offset_rows(eng, k, batch)
            msk = batch[k].mask
        ids_parts.append(ids.reshape(-1))
        mask_parts.append(msk.reshape(-1).astype(jnp.float32))
    return jnp.concatenate(ids_parts), jnp.concatenate(mask_parts)


def _offset_rows(eng, key: str, batch):
    _, offset, _ = eng.table_map[eng.columns[key].categorical_column.key]
    rows = batch[key].rows
    return rows + offset if offset else rows


def gather_fold(eng, weights, batch, plans) -> Dict[str, Any]:
    """Stage 1 (NOT differentiated): packed gather + fold.  Returns, per
    storage, the folded activations {segment start -> array} plus the
    (ids, ohm) needed by the scatter stage."""
    out = {}
    for skey, segs in plans.items():
        d = eng.storage[skey][1]
        pg = gather_pack(d)
        ids, mask = storage_stream(eng, skey, segs, batch)
        wp = pack_table(weights[skey].astype(jnp.float32))
        wide = jnp.take(wp, ids // pg, axis=0)
        ohm = build_ohm(ids, mask, d)
        acts = []
        for seg in segs:
            w_seg = wide[seg.start:seg.start + seg.size]
            o_seg = ohm[seg.start:seg.start + seg.size]
            if seg.kind == "mean":
                acts.append(fold_mean_tpu(w_seg, o_seg, seg.l, d))
            else:
                acts.append(fold_rows_tpu(w_seg, o_seg, d))
        out[skey] = {"acts": acts, "ids": ids, "ohm": ohm, "mask": mask}
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
    (small targets are ~6x faster; each table sees only its own stream
    spans), then run the lazy dense optimizer pass (same update as the
    classic paths)."""
    new_state = dict(state)
    for skey, segs in plans.items():
        d = eng.storage[skey][1]
        ps = scatter_pack(d)
        ids, ohm = ctx[skey]["ids"], ctx[skey]["ohm"]
        payloads = []
        for seg, g in zip(segs, g_acts[skey]):
            o_seg = ohm[seg.start:seg.start + seg.size]
            if seg.kind == "mean":
                payloads.append(unfold_mean_tpu(g, o_seg, seg.l))
            else:
                payloads.append(unfold_rows_tpu(g.reshape(seg.size, d), o_seg))

        def pay_slice(s, n):
            """Payload rows [s, s+n) as a view of the owning segment's array
            (spans never cross segments), avoiding a full-payload concat —
            a 2x payload round-trip through HBM (scripts/probe9.py)."""
            for seg, arr in zip(segs, payloads):
                if seg.start <= s and s + n <= seg.start + seg.size:
                    return arr[s - seg.start:s - seg.start + n]
            raise AssertionError((s, n))

        spans = table_spans(eng, segs, batch)
        g_parts, c_parts = [], []
        for off, tkey, rows_t in eng._storage_members(skey):
            lanes = ps * (d + 1)
            np_t = -(-rows_t // ps)
            if tkey in spans:
                # one scatter per contiguous stream span (no concat copies)
                acc = jnp.zeros((np_t, _LANES), jnp.float32)
                for s, n in spans[tkey]:
                    phys = (ids[s:s + n] - off) // ps   # off % ps == 0
                    acc = acc.at[phys].add(pay_slice(s, n), mode="drop")
                flat = acc[:, :lanes].reshape(np_t * ps, d + 1)[:rows_t]
                g_parts.append(flat[:, :d])
                c_parts.append(flat[:, d:])
            else:
                g_parts.append(jnp.zeros((rows_t, d), jnp.float32))
                c_parts.append(jnp.zeros((rows_t, 1), jnp.float32))
        G = g_parts[0] if len(g_parts) == 1 else jnp.concatenate(g_parts)
        cnt = c_parts[0] if len(c_parts) == 1 else jnp.concatenate(c_parts)
        tstate = state[skey]
        row_mask = (cnt > 0).astype(jnp.float32)
        w, opt = eng.sparse_opt.update(tstate["w"].astype(jnp.float32), G,
                                       tstate["opt"], row_mask)
        new_state[skey] = {"w": w.astype(tstate["w"].dtype), "opt": opt,
                           "show": tstate["show"] + cnt}
    return new_state


def lookup_packed(eng, weights, batch) -> Dict[str, Any]:
    """Forward-only packed lookup (eval / predict / serving): packed gather
    + fold for packable storages, classic fused gather for the rest.  Same
    outputs as ``EmbeddingFeatures.lookup(mode='local')`` (tested); NOT
    differentiable w.r.t. ``weights`` (the train step differentiates at the
    folded-activation level instead — see ``train/step.py::step_packed``)."""
    pk, _ = storages_packed(eng)
    plans = plan_segments(eng, batch, storages=set(pk))
    ctx = gather_fold(eng, weights, batch, plans)
    out = combine_from_acts(eng, plans, ctx, batch)
    classic_batch = {
        k: v for k, v in batch.items()
        if k in eng.columns
        and eng.table_map[eng.columns[k].categorical_column.key][0]
        not in plans}
    if classic_batch:
        out.update(eng.lookup(weights, classic_batch, mode="local"))
    return out


def storages_packed(eng) -> Tuple[List[str], List[str]]:
    """Split storages into (packed, classic) sets.  Packed requires: f32
    storage, packable dim, and P-aligned table offsets (the engine aligns
    them when built with packing enabled)."""
    packed, classic = [], []
    for skey, (rows, d) in eng.storage.items():
        ok = (packable(d)
              and eng.storage_dtype(d) == jnp.float32
              and rows % gather_pack(d) == 0
              and all(off % gather_pack(d) == 0 and off % scatter_pack(d) == 0
                      for off, _, _ in eng._storage_members(skey)))
        (packed if ok else classic).append(skey)
    return packed, classic
