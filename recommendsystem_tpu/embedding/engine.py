"""EmbeddingFeatures: the core sparse-embedding engine.

TPU-native replacement for ``tn.layers.EmbeddingFeatures(embedding_columns,
sparse_opt)(inputs)`` (``rank/ctr/base_model.py:216``, ``staytime/
VideoDnn.py:237``): lookup feasigns in (row-sharded) tables, combine, return
dense per-column tensors; sequence columns return an ``(emb_3d, mask)`` tuple
(``staytime/VideoDnn.py:235-236``).  On the backward pass the per-row sparse
optimizer attached HERE (not to the Keras training loop) applies lazy updates
to touched rows only — the PS push/pull contract, re-expressed as pure
functions over a table pytree.

Distribution: one ``jax.sharding.Mesh``; tables are row-sharded over
``DATA_AXIS`` and lookup runs inside ``shard_map`` as bucketize-by-owner ->
``all_to_all`` (ICI) -> local gather -> ``all_to_all`` back (SURVEY §5
"Distributed communication backend").  ``mode='local'`` (single device or
replicated tables) uses a plain gather.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DATA_AXIS
from .feature_column import EmbeddingColumn
from . import packed as packed_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IdBatch:
    """Padded, host-hashed ids of one feature: rows (B, L) int32 in
    [0, bucket); mask (B, L) {0,1}.  Registered as a pytree so batches flow
    through jit/shard_map boundaries.

    CONTRACT: ``rows`` MUST already be hashed into [0, bucket_size) — the
    engine's gathers run with ``mode="promise_in_bounds"`` (out-of-range ids
    read undefined garbage rather than clamping; measured ~2 ms/storage
    saved per step).  Every in-package constructor (``data/parse.py``,
    ``data/synthetic.py``, ``data/native_loader.py``, ``serving/server.py``)
    hashes with splitmix64 mod bucket and therefore satisfies it.  If you
    build IdBatches by hand, run ``validate_batch(engine, batch)`` (host-side
    numpy assert) before feeding them to lookup/train steps."""

    rows: Any
    mask: Any

    @property
    def shape(self):
        return self.rows.shape


def pad_bucket(bucket_size: int, n_shards: int) -> int:
    return ((bucket_size + n_shards - 1) // n_shards) * n_shards


def validate_batch(engine: "EmbeddingFeatures",
                   batch: Dict[str, "IdBatch"]) -> None:
    """Host-side bounds check of the IdBatch contract (see ``IdBatch``):
    every id must lie in [0, bucket).  The engine's promise_in_bounds
    gathers make out-of-range ids undefined behavior (silent garbage
    embeddings), so externally-constructed batches should fail loudly here
    instead.  Cheap (numpy max per column); not jittable by design."""
    import numpy as np
    for key, ib in batch.items():
        col = engine.columns.get(key)
        if col is None:
            continue
        bucket = col.categorical_column.bucket_size
        rows = np.asarray(ib.rows)
        if rows.size == 0:
            continue
        lo, hi = int(rows.min()), int(rows.max())
        if lo < 0 or hi >= bucket:
            raise ValueError(
                f"IdBatch[{key}]: ids must be hashed into [0, {bucket}); "
                f"got range [{lo}, {hi}]. Hash raw feasigns with the "
                f"column's category_column (splitmix64 mod bucket) first — "
                f"out-of-range ids read undefined rows under the engine's "
                f"promise_in_bounds gathers.")


def exchange_capacity(e: int, n: int, factor) -> int:
    """Per-destination bucket capacity of one all-to-all exchange.

    ``factor=None`` — exact: capacity E (there are only E entries, so no
    destination can overflow) — but every device then processes O(n·E)
    received slots, killing strong scaling.  With splitmix64-hashed ids the
    owner distribution is uniform, so capacity ``factor·E/n`` (factor ~2)
    overflows with probability ~exp(-E/n) ≈ 0 and restores O(E) per-device
    exchange work.  Overflowing entries are dropped and counted, never
    silently mis-routed.

    ``factor="auto"`` (the engine default) — bounded 2.0 when the exchange
    is large enough that real-id overflow is statistically impossible
    (E ≥ 256·n: a shard would need > 2E/n of E uniform draws,
    P < exp(-E/3n) ≤ e⁻⁸⁵), exact otherwise (tiny test/debug exchanges,
    where bit-parity with local mode matters more than scaling)."""
    if factor == "auto":
        factor = 2.0 if e >= 256 * n else None
    if factor is None:
        return e
    return max(1, min(e, -(-int(e * factor) // n)))


def _owner_slots(flat_rows: jnp.ndarray, rows_per_shard: int, n: int,
                 capacity: int, mask: Optional[jnp.ndarray] = None):
    """Routing plan for a fixed-capacity all-to-all exchange: for each of the
    E local entries, the owning shard, the shard-local row, a slot
    ``owner * capacity + rank`` (rank = position within that owner's bucket)
    and an in-capacity flag (always true when capacity == E and no mask).

    ``mask`` (E,) {0,1}: padding entries (mask 0, id 0 from the zero-fill
    parse contract) would otherwise all rank into shard 0's bucket and
    swallow its capacity — with realistic VarLen widths most of the stream
    is padding, so a bounded exchange would drop REAL shard-0 entries.
    With a mask, padded entries consume no capacity and are statically
    dropped (their values are mask-zeroed downstream in every combine /
    grad path, so routing them is pure waste)."""
    owner = flat_rows // rows_per_shard                    # (E,)
    local_row = flat_rows % rows_per_shard
    onehot = jax.nn.one_hot(owner, n, axis=0, dtype=jnp.int32)   # (n, E)
    if mask is not None:
        onehot = onehot * mask.astype(jnp.int32)[None, :]
    rank = jnp.cumsum(onehot, axis=1) - 1                  # (n, E) rank within owner bucket
    rank_of_i = jnp.take_along_axis(rank, owner[None, :], axis=0)[0]  # (E,)
    if capacity >= flat_rows.shape[0] and mask is None:
        in_cap = None   # statically exact: no overflow possible
        slot = owner * capacity + rank_of_i
    else:
        in_cap = rank_of_i < capacity
        if mask is not None:
            in_cap = in_cap & (mask > 0)
        # overflow -> out-of-range slot, dropped by scatter mode="drop"
        slot = jnp.where(in_cap, owner * capacity + rank_of_i, n * capacity)
    return owner, local_row, slot, in_cap


def all_to_all_lookup(w_local: jnp.ndarray, flat_rows: jnp.ndarray,
                      axis_name: str, capacity_factor=None,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Inside-shard_map distributed gather.

    ``w_local``: (rows_per_shard, D) — this device's contiguous row shard.
    ``flat_rows``: (E,) int32 global row ids needed by this device.
    ``mask``: optional (E,) {0,1} — padding entries neither consume bounded
    capacity nor get values back (zeros; they are mask-zeroed downstream
    anyway).  Ignored when the capacity is exact (zero-overhead there).
    Returns (E, D) embeddings (zeros for entries dropped by a bounded
    capacity — see ``exchange_capacity``; never happens for real entries
    when exact, and statistically never for hashed-uniform real ids at
    factor 2).
    """
    n = jax.lax.axis_size(axis_name)
    e = flat_rows.shape[0]
    cap = exchange_capacity(e, n, capacity_factor)
    if cap >= e:
        mask = None   # exact: every entry fits; skip the mask pass
    owner, local_row, slot, in_cap = _owner_slots(flat_rows, w_local.shape[0],
                                                  n, cap, mask)
    send_rows = jnp.zeros((n * cap,), jnp.int32).at[slot].set(local_row,
                                                              mode="drop")
    send_rows = send_rows.reshape(n, cap)
    recv_rows = jax.lax.all_to_all(send_rows, axis_name, split_axis=0,
                                   concat_axis=0, tiled=False)
    # recv_rows[j]: rows of MY shard requested by device j
    vals = jnp.take(w_local, recv_rows.reshape(-1), axis=0)          # (n*cap, D)
    vals = vals.reshape(n, cap, -1)
    vals_back = jax.lax.all_to_all(vals, axis_name, split_axis=0,
                                   concat_axis=0, tiled=False)       # (n, cap, D)
    flat = vals_back.reshape(n * cap, -1)
    # overflow slots index out of range: clip (jnp.take would NaN-fill),
    # then zero via the in-capacity flag
    out = jnp.take(flat, slot, axis=0, mode="clip")                  # (E, D)
    if in_cap is not None:
        out = out * in_cap[:, None].astype(out.dtype)
    return out


def route_grads_to_owners(flat_rows: jnp.ndarray, grads: jnp.ndarray,
                          mask: jnp.ndarray, rows_per_shard: int,
                          axis_name: str, capacity_factor=None):
    """Inside-shard_map transpose of the lookup exchange: ship each (row,
    grad, weight) triple to the shard that owns the row — the PS *push*.

    ``flat_rows``: (E,) global rows this device touched; ``grads``: (E, D);
    ``mask``: (E,) {0,1} (0 = padding slot).  Returns the (n·cap,) local
    rows, (n·cap, D) grads and (n·cap,) mask received by THIS shard from all
    peers; unfilled exchange slots carry mask 0 / grad 0 / row 0.
    """
    n = jax.lax.axis_size(axis_name)
    e = flat_rows.shape[0]
    cap = exchange_capacity(e, n, capacity_factor)
    # padding (mask 0) consumes no bounded capacity — see _owner_slots
    owner, local_row, slot, in_cap = _owner_slots(
        flat_rows, rows_per_shard, n, cap, mask if cap < e else None)
    d = grads.shape[-1]
    if in_cap is not None:
        mask = mask * in_cap.astype(mask.dtype)
    send_rows = jnp.zeros((n * cap,), jnp.int32).at[slot].set(local_row,
                                                              mode="drop")
    send_mask = jnp.zeros((n * cap,), jnp.float32).at[slot].set(mask,
                                                                mode="drop")
    send_grads = jnp.zeros((n * cap, d), grads.dtype).at[slot].set(
        grads * mask[:, None], mode="drop")
    a2a = lambda x: jax.lax.all_to_all(x.reshape(n, cap, *x.shape[1:]),
                                       axis_name, split_axis=0, concat_axis=0,
                                       tiled=False)
    recv_rows = a2a(send_rows).reshape(-1)
    recv_mask = a2a(send_mask).reshape(-1)
    recv_grads = a2a(send_grads).reshape(-1, d)
    return recv_rows, recv_grads, recv_mask


def _combine(emb: jnp.ndarray, mask: jnp.ndarray, combiner: str) -> jnp.ndarray:
    """(B, L, D) + (B, L) -> (B, D).  'mean' divides by the live count and
    returns zeros for empty rows (TF embedding_column semantics)."""
    m = mask.astype(emb.dtype)
    summed = jnp.einsum("bld,bl->bd", emb, m, preferred_element_type=jnp.float32)
    if combiner == "sum":
        return summed
    count = jnp.sum(m, axis=1, keepdims=True)
    if combiner == "sqrtn":
        return summed / jnp.sqrt(jnp.maximum(count, 1.0))
    return summed / jnp.maximum(count, 1.0)


class EmbeddingFeatures:
    """A collection of embedding columns backed by per-slot tables."""

    def __init__(self, embedding_columns: List[EmbeddingColumn], sparse_opt,
                 name: str = "sparse_emb_input", num_shards: int = 1,
                 group_tables: bool = False, table_dtype=jnp.float32,
                 a2a_capacity_factor="auto", packed: bool = True,
                 packed_state: bool = True,
                 max_group_bytes: Optional[int] = 40 << 20):
        self.name = name
        self.sparse_opt = sparse_opt
        self.num_shards = num_shards
        self.group_tables = group_tables
        # lane-packed fast path (embedding/packed.py): tables reshape to
        # 128-lane physical rows so gathers/scatters move full HBM
        # transactions instead of lane-padded narrow rows (16x blowup for
        # D=8 on TPU).  ``packed=True`` only ALIGNS table offsets (rows pad
        # to num_shards * lcm(gather_pack, scatter_pack) — see ``stride_of``;
        # NOTE round 4 changed this from lcm(pg, ps, num_shards), so sharded
        # packable storages saved by earlier rounds have different padded
        # shapes and won't restore — re-init or re-pad such checkpoints);
        # whether the packed kernels actually run is the train step's
        # ``sparse_update`` choice.
        self.packed = packed
        # packed OPTIMIZER STATE (``packed.state_packable``): qualifying
        # storages (SparseAdam, f32, packable dim, Ps-aligned) store
        # w/m/v as (rows/Ps, 128) lane groups with show/t on spare lanes —
        # the backward accumulator already arrives in that layout, so the
        # lazy Adam pass runs without acc unpack / pack_table / narrow
        # (rows, 1) passes (~25-28 ms of the round-4 headline,
        # PROFILE_r04.md).  Checkpoints save the packed layout; restoring a
        # classic checkpoint into a packed engine (or vice versa) needs
        # ``packed.pack_state_entry``/``unpack_state_entry`` migration.
        self.packed_state = packed_state
        # O(touched-rows) optimizer crossover: when the engine's TOTAL
        # packed-state rows exceed this, the local packed step switches
        # from the lazy O(table) pass to sort+segment-sum+row-update
        # (``packed.row_update_packed_storage``).  DEFAULT OFF on this
        # platform: the packed-state layout already collapsed the O(table)
        # pass (96M rows: 500 -> 198 ms/step — the old cost was the 128x
        # tiling blowup of the narrow (rows, 1) arrays, not the streaming),
        # while per-row sort/gather/scatter costs ~80-100 ns/entry, so the
        # measured A/B (scripts/probe21.py, PROFILE_r05.md) puts the
        # crossover beyond ~300M rows at production batch sizes.  Set a
        # row threshold to enable for pod-scale tables past that.
        self.row_update_min_rows = 1 << 62
        # cap on one storage group's byte size: jnp.take from a <~40 MB
        # target runs ~3.3x faster per id than from a >128 MB one (HBM
        # locality, measured scripts/probe6.py), so same-shape tables split
        # into multiple storage groups rather than one huge array.
        self.max_group_bytes = max_group_bytes
        # bounded all-to-all bucket capacity (see exchange_capacity): None =
        # exact (bit-parity with local mode); ~2.0 = production pods, where
        # hashed-uniform ids make overflow vanishingly rare and per-device
        # exchange work drops from O(n·E) to O(E).  Default "auto": bounded
        # 2.0 for large exchanges (E >= 256·n), exact for tiny ones — so
        # pods scale by default and small parity tests stay exact.  Padding
        # entries never consume bounded capacity (mask-aware routing).
        self.a2a_capacity_factor = a2a_capacity_factor
        # dedup ids per storage group before the gather: the padded id
        # stream repeats rows (padding + hot ids), so gathering unique rows
        # from the big table and re-expanding from the compacted copy trades
        # a sort for table-random HBM reads.  Opt-in; numerics identical.
        self.dedup_gather = False
        # bf16 table storage halves gather bandwidth + table memory; all
        # arithmetic (combine, optimizer) stays fp32, values round-trip
        # through the storage dtype on write.  "auto" picks bf16 for dim>=32
        # tables and fp32 for narrower rows, where the HBM transaction
        # granularity swallows the byte saving (measured: STATUS.md).
        self.table_dtype = table_dtype
        self.columns: Dict[str, EmbeddingColumn] = {}
        self.tables: Dict[str, Tuple[int, int]] = {}   # table_key -> (rows, dim)
        for col in embedding_columns:
            key = col.key
            if key in self.columns:
                raise ValueError(f"duplicate embedding column {key}")
            self.columns[key] = col
            tkey = col.categorical_column.key
            rows = pad_bucket(col.categorical_column.bucket_size, num_shards)
            if tkey in self.tables:
                prev_rows, prev_dim = self.tables[tkey]
                if prev_dim != col.dimension:
                    raise ValueError(f"table {tkey}: inconsistent dims")
                self.tables[tkey] = (max(prev_rows, rows), col.dimension)
            else:
                self.tables[tkey] = (rows, col.dimension)

        # Table-group fusion: same-shape tables stack into one physical array
        # so the step issues ONE gather / scatter per shape class instead of
        # one per slot (staytime: 93 -> ~2).  ``storage`` maps storage_key ->
        # (total_rows, dim); ``table_map`` maps table_key -> (storage_key,
        # row_offset, rows).
        self.table_map: Dict[str, Tuple[str, int, int]] = {}
        self.storage: Dict[str, Tuple[int, int]] = {}

        def stride_of(rows: int, dim: int) -> int:
            """Member stride: rows padded so every member offset AND every
            shard boundary is a multiple of both lane packings — rows per
            shard must stay pg/ps-aligned so a physical (128-lane) row never
            straddles two shards and phys-row ownership equals row ownership
            in the sharded packed exchange."""
            if not packed or not packed_mod.packable(dim):
                return rows
            a = max(1, num_shards) * math.lcm(packed_mod.gather_pack(dim),
                                              packed_mod.scatter_pack(dim))
            return -(-rows // a) * a

        if group_tables:
            by_shape: Dict[Tuple[int, int], List[str]] = {}
            for tkey in sorted(self.tables):
                by_shape.setdefault(self.tables[tkey], []).append(tkey)
            for (rows, dim), members in sorted(by_shape.items()):
                stride = stride_of(rows, dim)
                per_chunk = len(members)
                if max_group_bytes:
                    bytes_per = stride * dim * 4
                    per_chunk = max(1, min(per_chunk,
                                           max_group_bytes // max(1, bytes_per)))
                chunks = [members[i:i + per_chunk]
                          for i in range(0, len(members), per_chunk)]
                for ci, chunk in enumerate(chunks):
                    if len(chunk) == 1:
                        tkey = chunk[0]
                        self.storage[tkey] = (stride, dim)
                        self.table_map[tkey] = (tkey, 0, stride)
                    else:
                        skey = f"group_{stride}x{dim}" + (
                            f"_c{ci}" if len(chunks) > 1 else "")
                        self.storage[skey] = (stride * len(chunk), dim)
                        for i, tkey in enumerate(chunk):
                            self.table_map[tkey] = (skey, i * stride, stride)
        else:
            for tkey, (rows, dim) in self.tables.items():
                stride = stride_of(rows, dim)
                self.storage[tkey] = (stride, dim)
                self.table_map[tkey] = (tkey, 0, stride)

    # ---------------- state ----------------

    def storage_dtype(self, dim: int):
        if self.table_dtype == "auto":
            return jnp.bfloat16 if dim >= 32 else jnp.float32
        return self.table_dtype

    def init(self, rng) -> Dict[str, Dict[str, Any]]:
        state = {}
        for skey, (rows, dim) in sorted(self.storage.items()):
            rng, sub = jax.random.split(rng)
            if packed_mod.state_packable(self, skey):
                state[skey] = packed_mod.packed_state_init(self, sub, skey)
            else:
                state[skey] = {
                    "w": self.sparse_opt.table_init(
                        sub, (rows, dim), dtype=self.storage_dtype(dim)),
                    "opt": self.sparse_opt.init_state((rows, dim)),
                    "show": jnp.zeros((rows, 1), jnp.float32),
                }
        return state

    def shardings(self, mesh: Mesh) -> Dict[str, Dict[str, Any]]:
        """NamedShardings: table rows + per-row states over DATA_AXIS."""
        row = NamedSharding(mesh, P(DATA_AXIS, None))
        out = {}
        for skey in self.storage:
            if packed_mod.state_packable(self, skey):
                out[skey] = {"w": row, "opt": {"m_p": row, "v_p": row}}
            else:
                opt = jax.tree.map(lambda _: row,
                                   self.sparse_opt.init_state((1, 1)))
                out[skey] = {"w": row, "opt": opt, "show": row}
        return out

    # ---------------- lookup ----------------

    def lookup(self, weights: Dict[str, jnp.ndarray], batch: Dict[str, IdBatch],
               mode: str = "local", axis_name: str = DATA_AXIS
               ) -> Dict[str, Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]]:
        """``weights``: {table_key: (rows, D)}.  ``batch``: {column_key: IdBatch}.

        Differentiable w.r.t. ``weights``.  With ``mode='sharded'`` this must
        run inside shard_map over ``axis_name`` with row-sharded weights; the
        exchange is fused per STORAGE group (one all-to-all per physical
        array, not per column — staytime: 93 columns -> ~2 exchanges).
        """
        raw = self.gather_raw(weights, batch, mode=mode, axis_name=axis_name)
        return self.combine_raw(raw, batch)

    def lookup_sharded(self, weights: Dict[str, jnp.ndarray],
                       batch: Dict[str, IdBatch], mesh: Mesh,
                       axis_name: str = DATA_AXIS):
        """shard_map wrapper: tables row-sharded, batch data-sharded, outputs
        data-sharded.  Composes under an outer jit (the train step)."""
        w_specs = jax.tree.map(lambda _: P(axis_name, None), weights)
        b_specs = jax.tree.map(lambda _: P(axis_name), batch)
        out_shape = jax.eval_shape(lambda w, b: self.lookup(w, b, mode="local"),
                                   weights, batch)
        out_specs = jax.tree.map(lambda _: P(axis_name), out_shape)
        fn = jax.shard_map(
            lambda w, b: self.lookup(w, b, mode="sharded", axis_name=axis_name),
            mesh=mesh, in_specs=(w_specs, b_specs), out_specs=out_specs,
            check_vma=False)
        return fn(weights, batch)

    # ---------------- two-stage lookup (scatter-update path) ----------------
    #
    # The autodiff-through-gather path materializes table-shaped dense grads
    # and the lazy optimizer then streams EVERY table row through HBM — O(sum
    # of table sizes) per step.  The production path splits lookup into an
    # explicit gather stage (not differentiated) and a combine stage
    # (differentiated), takes grads w.r.t. the gathered (B, L, D) activations
    # and applies unique+segment-sum scatter updates touching only the
    # batch's rows: O(batch ids) HBM traffic, the actual PS push semantics.

    def _per_storage_columns(self, batch) -> Dict[str, List[str]]:
        per_storage: Dict[str, List[str]] = {}
        for key, col in self.columns.items():
            if key in batch:
                skey, _, _ = self.table_map[col.categorical_column.key]
                per_storage.setdefault(skey, []).append(key)
        return per_storage

    def a2a_drop_report(self, batch: Dict[str, "IdBatch"], mesh: Mesh,
                        axis_name: str = DATA_AXIS) -> Dict[str, Dict[str, int]]:
        """Count the REAL (non-padding) entries each bounded all-to-all
        exchange would drop for this batch — the observable behind the
        'dropped and counted, never silently mis-routed' contract.

        Returns {storage_key: {granularity: count}} summed over devices,
        where granularity is 'rows' (classic scatter/dense exchange) and,
        for packable storages, 'phys_gather' / 'phys_push' (the packed
        512-B-physical-row exchanges, id // Pg and id // Ps).  All zeros on
        exact capacity; statistically always zero for hashed-uniform ids at
        factor 2 — assert that in scaling drills (``dryrun_multichip``)."""
        from . import packed as packed_mod
        b_specs = jax.tree.map(lambda _: P(axis_name), batch)

        def drops(ids, mask, rows_per_shard, n, cap):
            _, _, _, in_cap = _owner_slots(ids, rows_per_shard, n, cap, mask)
            if in_cap is None:
                return jnp.int32(0)
            valid = mask > 0
            return jnp.sum((valid & ~in_cap).astype(jnp.int32))

        def local_fn(b):
            n = jax.lax.axis_size(axis_name)
            out = {}
            for skey, keys in self._per_storage_columns(b).items():
                rows_storage, d = self.storage[skey]
                rows_local = rows_storage // n
                ids = jnp.concatenate(self._storage_flat_rows(skey, keys, b))
                mask = jnp.concatenate([b[k].mask.reshape(-1) for k in keys])
                e = ids.shape[0]
                cap = exchange_capacity(e, n, self.a2a_capacity_factor)
                rep = {"rows": drops(ids, mask, rows_local, n, cap)}
                if packed_mod.packable(d):
                    pg, ps = packed_mod.gather_pack(d), packed_mod.scatter_pack(d)
                    if rows_local % pg == 0 and rows_local % ps == 0:
                        rep["phys_gather"] = drops(ids // pg, mask,
                                                   rows_local // pg, n, cap)
                        rep["phys_push"] = drops(ids // ps, mask,
                                                 rows_local // ps, n, cap)
                out[skey] = jax.tree.map(
                    lambda x: jax.lax.psum(x, axis_name), rep)
            return out

        fn = jax.shard_map(local_fn, mesh=mesh, in_specs=(b_specs,),
                           out_specs=P(), check_vma=False)
        rep = jax.jit(fn)(batch)
        return jax.tree.map(int, jax.device_get(rep))

    def _storage_flat_rows(self, skey: str, keys: List[str], batch):
        """Concatenated (offset-applied) flat row ids of every member column
        of one storage array, in member order."""
        flat_ids = []
        for key in keys:
            _, offset, _ = self.table_map[
                self.columns[key].categorical_column.key]
            rows = batch[key].rows
            flat_ids.append((rows + offset if offset else rows).reshape(-1))
        return flat_ids

    def gather_raw(self, weights: Dict[str, jnp.ndarray],
                   batch: Dict[str, IdBatch], mode: str = "local",
                   axis_name: str = DATA_AXIS) -> Dict[str, jnp.ndarray]:
        """One fused gather per storage array: concat every member column's
        flat ids, take (or all-to-all, when sharded) once, split back."""
        raw = {}
        for skey, keys in self._per_storage_columns(batch).items():
            flat_ids = self._storage_flat_rows(skey, keys, batch)
            all_ids = jnp.concatenate(flat_ids)
            inv = None
            if self.dedup_gather:
                all_ids, inv = jnp.unique(all_ids, return_inverse=True,
                                          size=all_ids.shape[0], fill_value=0)
            if mode == "sharded":
                # flat padding mask rides along so padded entries don't
                # consume bounded a2a capacity (deduped streams have no
                # per-entry mask alignment — skip it there)
                all_mask = None if inv is not None else jnp.concatenate(
                    [batch[k].mask.reshape(-1) for k in keys])
                gathered = all_to_all_lookup(weights[skey], all_ids, axis_name,
                                             self.a2a_capacity_factor,
                                             mask=all_mask)
            else:
                # ids are hash-bounded (< bucket <= storage rows), so promise
                # in-bounds: skips the out-of-bounds select pass XLA fuses
                # after a default-mode gather (measured ~2 ms/storage at
                # headline shapes, round-4 op trace)
                gathered = weights[skey].at[all_ids].get(
                    mode="promise_in_bounds")
            if inv is not None:
                gathered = jnp.take(gathered, inv, axis=0)
            gathered = gathered.astype(jnp.float32)
            start = 0
            for key, ids in zip(keys, flat_ids):
                n = ids.shape[0]
                b, l = batch[key].rows.shape
                raw[key] = gathered[start:start + n].reshape(b, l, -1)
                start += n
        return raw

    def gather_raw_sharded(self, weights: Dict[str, jnp.ndarray],
                           batch: Dict[str, IdBatch], mesh: Mesh,
                           axis_name: str = DATA_AXIS):
        """shard_map wrapper of the fused gather: tables row-sharded, batch
        data-sharded, raw (B, L, D) activations data-sharded."""
        w_specs = jax.tree.map(lambda _: P(axis_name, None), weights)
        b_specs = jax.tree.map(lambda _: P(axis_name), batch)
        out_shape = jax.eval_shape(
            lambda w, b: self.gather_raw(w, b, mode="local"), weights, batch)
        out_specs = jax.tree.map(lambda _: P(axis_name), out_shape)
        fn = jax.shard_map(
            lambda w, b: self.gather_raw(w, b, mode="sharded",
                                         axis_name=axis_name),
            mesh=mesh, in_specs=(w_specs, b_specs), out_specs=out_specs,
            check_vma=False)
        return fn(weights, batch)

    def combine_raw(self, raw: Dict[str, jnp.ndarray],
                    batch: Dict[str, IdBatch]):
        out = {}
        for key, col in self.columns.items():
            if key not in raw:
                continue
            ids = batch[key]
            if col.is_sequence:
                emb = raw[key] * ids.mask.astype(raw[key].dtype)[..., None]
                out[key] = (emb, ids.mask.astype(bool))
            else:
                out[key] = _combine(raw[key], ids.mask, col.combiner)
        return out

    def flatten_raw_grads(self, raw_grads: Dict[str, jnp.ndarray],
                          batch: Dict[str, IdBatch]):
        """Group per-column (B, L, D) grads by TABLE -> (table-local rows,
        grads, mask) flat arrays.  Rows are local to the member table (no
        storage offset): the scatter accumulators target one table each —
        small scatter targets run ~6x faster than one storage-wide scatter
        on TPU (measured, scripts/probe4.py)."""
        per_table: Dict[str, list] = {}
        for key, g in raw_grads.items():
            col = self.columns[key]
            ids = batch[key]
            d = g.shape[-1]
            tkey = col.categorical_column.key
            per_table.setdefault(tkey, []).append(
                (ids.rows.reshape(-1), g.reshape(-1, d),
                 ids.mask.reshape(-1).astype(jnp.float32)))
        out = {}
        for tkey, parts in per_table.items():
            rows = jnp.concatenate([p[0] for p in parts])
            grads = jnp.concatenate([p[1] for p in parts])
            mask = jnp.concatenate([p[2] for p in parts])
            out[tkey] = (rows, grads, mask)
        return out

    def _storage_members(self, skey: str):
        """Member tables of one storage array, ordered by row offset."""
        return sorted((off, tkey, rows)
                      for tkey, (sk, off, rows) in self.table_map.items()
                      if sk == skey)

    @staticmethod
    def _dense_grad_and_count(rows, grads, mask, num_rows: int):
        """One scatter-add builds the dense [G | count] accumulator of one
        table: grads of padding slots are exactly zero (the combine is
        mask-scaled, so autodiff zeroes them), and the count column carries
        the mask so 'show'/per-row step counters see only real occurrences.

        (A lane-packed variant — scatter P=128//(D+1) payload rows per
        128-wide physical row — was measured equal end-to-end: the XLA
        lane-place materializes (E,128) arrays that cost what the narrower
        scatter saves.  The fused lane-place lives in the Pallas packed
        path instead.)"""
        payload = jnp.concatenate(
            [grads.astype(jnp.float32), mask[:, None]], axis=1)
        acc = jnp.zeros((num_rows, payload.shape[1]), jnp.float32)
        acc = acc.at[rows].add(payload, mode="drop")
        return acc[:, :-1], acc[:, -1:]

    def apply_gradients_scatter(self, state: Dict[str, Dict[str, Any]],
                                flat: Dict[str, Tuple]) -> Dict[str, Dict[str, Any]]:
        """The fast sparse update: per-table scatter-adds build a dense
        [grad | count] accumulator, then the LAZY per-row optimizer runs as
        one dense elementwise pass over the storage (touched rows move,
        untouched rows are where'd through).  On this hardware the dense
        elementwise pass runs at HBM bandwidth (~1.8 ns/row) while anything
        per-id costs ~15-90 ns/id, so O(table) elementwise + O(batch) scatter
        beats the unique+gather+row-update+scatter-back dance by ~20x
        (measured: scripts/profile_headline.py, probe4-6)."""
        new_state = {}
        for skey, tstate in state.items():
            members = self._storage_members(skey)
            if not any(tkey in flat for _, tkey, _ in members):
                new_state[skey] = tstate
                continue
            tstate, was_packed = self._classic_entry(skey, tstate)
            g_parts, c_parts = [], []
            for _, tkey, rows_t in members:
                if tkey in flat:
                    rows, grads, mask = flat[tkey]
                    G_t, c_t = self._dense_grad_and_count(rows, grads, mask,
                                                          rows_t)
                else:
                    dim = tstate["w"].shape[1]
                    G_t = jnp.zeros((rows_t, dim), jnp.float32)
                    c_t = jnp.zeros((rows_t, 1), jnp.float32)
                g_parts.append(G_t)
                c_parts.append(c_t)
            G = g_parts[0] if len(g_parts) == 1 else jnp.concatenate(g_parts)
            cnt = c_parts[0] if len(c_parts) == 1 else jnp.concatenate(c_parts)
            row_mask = (cnt > 0).astype(jnp.float32)
            w, opt = self.sparse_opt.update(tstate["w"].astype(jnp.float32),
                                            G, tstate["opt"], row_mask)
            new_state[skey] = self._store_entry(
                skey, {"w": w.astype(tstate["w"].dtype), "opt": opt,
                       "show": tstate["show"] + cnt}, was_packed)
        return new_state

    def apply_gradients_scatter_sharded(self, state: Dict[str, Dict[str, Any]],
                                        raw_grads: Dict[str, jnp.ndarray],
                                        batch: Dict[str, IdBatch], mesh: Mesh,
                                        axis_name: str = DATA_AXIS):
        """The PS *push* on the mesh: each device flattens its batch shard's
        (B, L, D) activation grads per storage group, routes (row, grad,
        count) triples to the owning shard over ICI (one fixed-capacity
        exchange per storage group — the transpose of the fused lookup), and
        each owner applies a unique+segment-sum per-row update to its local
        rows.  O(batch ids) HBM traffic — never O(table) — which is what
        makes multi-billion-row tables trainable (the contract of
        ``tn.layers.EmbeddingFeatures``'s sparse optimizer,
        ``rank/ctr/base_model.py:216``)."""
        t_specs = jax.tree.map(lambda _: P(axis_name, None), state)
        g_specs = jax.tree.map(lambda _: P(axis_name), raw_grads)
        b_specs = jax.tree.map(lambda _: P(axis_name), batch)

        def local_fn(tables, graw, b):
            flat = self.flatten_raw_grads(graw, b)
            new = {}
            for skey, tstate in tables.items():
                members = self._storage_members(skey)
                parts = [(flat[tkey][0] + off if off else flat[tkey][0],
                          flat[tkey][1], flat[tkey][2])
                         for off, tkey, _ in members if tkey in flat]
                if not parts:
                    new[skey] = tstate
                    continue
                # the local shard's rows are Ps-aligned, so the packed-state
                # adapter works per shard too
                tstate, was_packed = self._classic_entry(skey, tstate)
                rows = jnp.concatenate([p[0].reshape(-1) for p in parts])
                grads = jnp.concatenate([p[1] for p in parts])
                mask = jnp.concatenate([p[2] for p in parts])
                l_rows, l_grads, l_mask = route_grads_to_owners(
                    rows, grads, mask, tstate["w"].shape[0], axis_name,
                    self.a2a_capacity_factor)
                G, cnt = self._dense_grad_and_count(
                    l_rows, l_grads, l_mask, tstate["w"].shape[0])
                row_mask = (cnt > 0).astype(jnp.float32)
                w, opt = self.sparse_opt.update(
                    tstate["w"].astype(jnp.float32), G, tstate["opt"],
                    row_mask)
                new[skey] = self._store_entry(
                    skey, {"w": w.astype(tstate["w"].dtype), "opt": opt,
                           "show": tstate["show"] + cnt}, was_packed)
            return new

        fn = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(t_specs, g_specs, b_specs),
                           out_specs=t_specs, check_vma=False)
        return fn(state, raw_grads, batch)

    # ---------------- sparse update ----------------

    def row_counts(self, batch: Dict[str, IdBatch]) -> Dict[str, jnp.ndarray]:
        """Per-table appearance counts (rows, 1) — the 'show' statistic that
        drives lazy updates and feature_drop_show-style eviction."""
        counts = {skey: jnp.zeros((rows,), jnp.float32)
                  for skey, (rows, _) in self.storage.items()}
        for key, col in self.columns.items():
            if key not in batch:
                continue
            skey, offset, _ = self.table_map[col.categorical_column.key]
            ids = batch[key]
            rows = ids.rows + offset if offset else ids.rows
            counts[skey] = counts[skey].at[rows.reshape(-1)].add(
                ids.mask.reshape(-1).astype(jnp.float32))
        return {k: v[:, None] for k, v in counts.items()}

    def apply_gradients(self, state: Dict[str, Dict[str, Any]],
                        grads: Dict[str, jnp.ndarray],
                        counts: Dict[str, jnp.ndarray]) -> Dict[str, Dict[str, Any]]:
        new_state = {}
        for tkey, tstate in state.items():
            g = grads.get(tkey)
            if g is None:
                new_state[tkey] = tstate
                continue
            tstate, was_packed = self._classic_entry(tkey, tstate)
            row_mask = (counts[tkey] > 0).astype(jnp.float32)
            w, opt = self.sparse_opt.update(tstate["w"].astype(jnp.float32),
                                            g, tstate["opt"], row_mask)
            w = w.astype(tstate["w"].dtype)
            new_state[tkey] = self._store_entry(
                tkey, {"w": w, "opt": opt,
                       "show": tstate["show"] + counts[tkey]}, was_packed)
        return new_state

    def evict(self, state, min_show: float, rng=None):
        """feature_drop_show analog (``rank/multi_head/multidnn.py:230-234``;
        -1 disables): rows seen fewer than ``min_show`` times are REPLACED BY
        FRESH ROWS — re-drawn from the optimizer's ``table_init`` with
        re-initialized per-row optimizer state and a zeroed show counter — so
        a re-touched feasign is statistically indistinguishable from one
        created on first touch (the PS create-on-touch contract)."""
        if min_show < 0:
            return state
        if rng is None:
            rng = jax.random.PRNGKey(0)
        out = {}
        for tkey, tstate in sorted(state.items()):
            tstate, was_packed = self._classic_entry(tkey, tstate)
            rows, dim = tstate["w"].shape
            keep = tstate["show"] >= min_show                      # (rows, 1)
            rng, sub = jax.random.split(rng)
            fresh_w = self.sparse_opt.table_init(sub, (rows, dim),
                                                 dtype=tstate["w"].dtype)
            fresh_opt = self.sparse_opt.init_state((rows, dim))
            out[tkey] = self._store_entry(tkey, {
                "w": jnp.where(keep, tstate["w"], fresh_w),
                "opt": jax.tree.map(
                    lambda cur, init: jnp.where(keep, cur,
                                                init.astype(cur.dtype)),
                    tstate["opt"], fresh_opt),
                "show": jnp.where(keep, tstate["show"], 0.0),
            }, was_packed)
        return out

    def maybe_evict(self, state, rng=None):
        """In-training admission hook: applies ``evict`` at the optimizer's
        own ``feature_drop_show`` threshold (``tn.core.AdaGrad(...,
        feature_drop_show)``, ``staytime/VideoDnn.py:233``); no-op for
        optimizers without one or with -1."""
        thresh = getattr(self.sparse_opt, "feature_drop_show", -1.0)
        return self.evict(state, thresh, rng)

    def weights(self, state):
        """(rows, D) weights per storage — the layout every classic consumer
        (two-stage gather, export, dense/scatter debug paths) expects.
        Packed-STATE storages unpack on the fly (an O(table) lane de-
        interleave); the packed execution path reads the raw packed arrays
        instead (``raw_weights``), so the unpack only materializes where a
        classic consumer actually uses it (XLA DCEs it otherwise)."""
        out = {}
        for tkey, t in state.items():
            if packed_mod.is_packed_state(t):
                out[tkey] = packed_mod.unpack_w(t["w"], self.storage[tkey][1])
            else:
                out[tkey] = t["w"]
        return out

    def raw_weights(self, state):
        """Raw per-storage table arrays in their STORED layout: (rows, D)
        classic or (rows/Ps, 128) packed-state."""
        return {tkey: t["w"] for tkey, t in state.items()}

    def classic_state(self, state):
        """Whole table state in the CLASSIC layout ({"w", "opt": {...},
        "show"} per storage) regardless of storage layout — the comparison /
        checkpoint-migration view of a packed-state engine."""
        return {skey: self._classic_entry(skey, t)[0]
                for skey, t in state.items()}

    def _classic_entry(self, skey, tstate):
        """(classic-layout view of one storage's state, was_packed flag) —
        the adapter that lets the classic update paths (dense / scatter /
        evict) run unchanged against packed-state storages at an O(table)
        conversion cost (those paths are debug/parity references; the
        production packed path updates the packed layout in place)."""
        if packed_mod.is_packed_state(tstate):
            return packed_mod.unpack_state_entry(tstate,
                                                 self.storage[skey][1]), True
        return tstate, False

    def _store_entry(self, skey, classic_tstate, was_packed):
        if was_packed:
            return packed_mod.pack_state_entry(classic_tstate,
                                               self.storage[skey][1])
        return classic_tstate
