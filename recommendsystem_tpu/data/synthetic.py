"""Synthetic Criteo/short-video-style data generation for tests & benchmarks.

The reference repo ships no data; BASELINE.md measures on "synthetic
Criteo-style CTR data".  Batches follow the framework's device contract:
padded int32 row ids + masks per feature (host-hashed), dense float inputs,
and per-task labels with a planted signal so AUC > 0.5 is learnable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..embedding.engine import IdBatch
from ..models.base import ModelBundle
from ..models import staytime as staytime_model
from .staytime_labels import staytime_labels


def synthetic_batch(bundle: ModelBundle, batch_size: int, seed: int = 0,
                    ids_per_feature=5) -> Tuple[
                        Dict[str, IdBatch], Optional[dict], Dict[str, np.ndarray],
                        np.ndarray]:
    """Returns (batch, dense_inputs, labels, sample_weight).

    A hidden per-sample scalar "engagement" drives both which ids appear and
    the labels, so models can actually learn from this data.

    ``ids_per_feature``: padded width of mean-combined columns — an int for
    all columns, or a {column_key: width} dict (unlisted columns default to
    1, matching mostly-single-valued production VarLen features).
    """
    rng = np.random.default_rng(seed)
    engagement = rng.uniform(0.0, 1.0, size=(batch_size,))

    batch: Dict[str, IdBatch] = {}
    for key, col in bundle.embedding.columns.items():
        bucket = col.categorical_column.bucket_size
        if col.is_sequence:
            length = col.seq_max_len
        elif isinstance(ids_per_feature, dict):
            length = ids_per_feature.get(key, 1)
        else:
            length = ids_per_feature
        # id values correlate with engagement: high-engagement users draw
        # from the low end of the id space
        centers = (engagement * 0.5 * bucket).astype(np.int64)
        noise = rng.integers(0, max(bucket // 2, 1), size=(batch_size, length))
        rows = ((centers[:, None] + noise) % bucket).astype(np.int32)
        lens = rng.integers(1, length + 1, size=(batch_size,))
        mask = (np.arange(length)[None, :] < lens[:, None]).astype(np.float32)
        # masked positions carry id 0, exactly like the real parse path
        # (``data/parse.py::pad_ids`` zero-fills) — matters for benchmarks:
        # padding rows are duplicate row-0 reads, not random table reads
        rows = rows * mask.astype(np.int32)
        batch[key] = IdBatch(rows=rows, mask=mask)

    dense_inputs = None
    if bundle.dense_input_keys:
        dense_inputs = {k: rng.integers(0, 2, size=(batch_size, 1)).astype(np.float32)
                        for k in bundle.dense_input_keys}

    labels: Dict[str, np.ndarray] = {}
    p = 1.0 / (1.0 + np.exp(-(engagement * 4.0 - 2.0)))       # planted CTR signal
    click = (rng.uniform(size=batch_size) < p).astype(np.float32)[:, None]
    weight = np.ones((batch_size, 1), np.float32)

    for task in bundle.losses:
        if task == staytime_model.T_STAY:
            wt_ms = (engagement * 60_000 * rng.uniform(0.5, 1.5, batch_size)).astype(np.int64)
            st, weight = staytime_labels(wt_ms)
            labels[staytime_model.T_STAY] = st["staytime"]
            labels[staytime_model.T_SHORT] = st["shortplay"]
            labels[staytime_model.T_LONG] = st["longplay"]
        elif task in labels:
            continue
        elif task == "distill":
            labels[task] = np.zeros((batch_size, 1), np.float32)
        else:
            # fresh correlated binary label per head
            flip = rng.uniform(size=(batch_size, 1)) < 0.15
            labels[task] = np.where(flip, 1.0 - click, click).astype(np.float32)
    return batch, dense_inputs, labels, weight
