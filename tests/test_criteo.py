"""Criteo-format support tests: line parsing, bucketization, end-to-end
training on a synthetic file in the exact Criteo TSV layout."""

import math
import os

import numpy as np
import pytest

from recommendsystem_tpu.data.criteo import (
    ALL_SLOTS, criteo_autoint, criteo_dataset, parse_line,
    write_synthetic_criteo)


class TestParseLine:
    def test_fields_and_buckets(self):
        ints = [str(2 ** i) for i in range(13)]
        cats = [format(i + 1, "x") for i in range(26)]
        label, feats = parse_line("\t".join(["1"] + ints + cats))
        assert label == 1.0
        assert len(feats) == 39
        # log2 bucketization: 2^i -> floor(log2(1+2^i)) == i for i >= 1
        assert feats[3] == [3] and feats[10] == [10]
        assert feats[13] == [1]            # hex c1

    def test_empty_fields(self):
        label, feats = parse_line("0\t\t5" + "\t" * 37 + "ff")
        assert feats[0] == [] and feats[1] == [int(math.log2(6))]
        assert feats[38] == [0xFF]
        assert feats[20] == []


def test_end_to_end_training(tmp_path):
    import jax
    from recommendsystem_tpu.train import evaluate, fit

    path = str(tmp_path / "criteo.tsv")
    write_synthetic_criteo(path, 2048, seed=0)
    assert len(open(path).readline().split("\t")) == 40

    bundle = criteo_autoint(bucket_size=4096, sparse_lr=5e-2, dense_lr=1e-2)
    assert len(bundle.embedding.columns) == 39

    def ds():
        return ((b, d, l, w) for b, d, l, w, _ in
                criteo_dataset(path, 128, bundle.embedding))

    state = fit(bundle, ds(), log_every=0)
    metrics = evaluate(bundle, ds(), state)
    auc = float(metrics["video_id_rank_skip_model"]["auc"])
    assert auc > 0.65, f"criteo AUC {auc}"
