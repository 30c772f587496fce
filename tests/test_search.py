"""Offline fusion-search tests: AUC metrics vs brute force/sklearn, PSO
improves fitness, GAUC engine grouping/gates, GP phase runs end-to-end."""

import random

import numpy as np
import pytest

from recommendsystem_tpu.search import (
    BASE_PARAMS, GPSearch, GaucEngine, Metrics, PSO, Reader,
    binary_label_auc, calc_fusion_scores, cal_mixed_score, default_bound_x,
    filter_user_group_sizes, float_label_auc, group_auc)


class TestOfflineAuc:
    def test_binary_auc_vs_sklearn(self):
        from sklearn.metrics import roc_auc_score
        rng = np.random.default_rng(0)
        y = rng.integers(0, 2, 400)
        p = rng.uniform(size=400)       # continuous -> no ties
        got = binary_label_auc(p, y)
        np.testing.assert_allclose(got, roc_auc_score(y, p), atol=1e-4)

    def test_reference_smoke_values(self):
        # pso/util.py:58-61 example
        labels, preds = [1, 0, 1], [0.1, 0.2, 0.14]
        assert Metrics.binaryIntLabelAuc(preds, labels) == 0.0
        assert Metrics.floatLabelAuc(preds, labels) == 0.0

    def test_float_auc_perfect_consistency(self):
        preds = [0.9, 0.5, 0.3, 0.1]
        labels = [40.0, 30.0, 20.0, 10.0]
        assert float_label_auc(preds, labels) == 1.0

    def test_float_auc_brute_force(self):
        rng = np.random.default_rng(1)
        preds = rng.uniform(size=30)
        labels = rng.uniform(size=30)
        got = float_label_auc(preds, labels)
        order = np.argsort(-preds, kind="stable")
        r = labels[order]
        n = len(r)
        brute = sum(1 for i in range(n) for j in range(i + 1, n) if r[i] > r[j])
        np.testing.assert_allclose(got, brute / (n * (n - 1) / 2))

    def test_degenerate_labels(self):
        assert binary_label_auc([0.1, 0.2], [1, 1]) == 0.0


class TestPSO:
    def _make_data(self, n=400, seed=0):
        """Synthetic score log: anchor ctr label driven by anctr_p."""
        rng = np.random.default_rng(seed)
        anctr_p = rng.uniform(0, 0.2, n)
        card_p = rng.uniform(0, 0.1, n)
        cvr_p = rng.uniform(0, 0.05, n)
        st_p = rng.uniform(0, 1, n)
        anctr_l = (rng.uniform(size=n) < anctr_p * 4).astype(int)
        card_l = (rng.uniform(size=n) < card_p * 5).astype(int)
        cvr_l = (rng.uniform(size=n) < cvr_p * 10).astype(int)
        st_l = st_p * 50 + rng.normal(0, 5, n)
        return np.stack([st_p, st_l, anctr_p, anctr_l, card_p, card_l,
                         cvr_p, cvr_l], axis=1)

    def test_fusion_score_formula(self):
        data = self._make_data(4)
        v = [1.0, 2.0, 3.0, 1.0, 10.0, 2.0]
        got = calc_fusion_scores(data, v, max_op=True)
        i = 0
        expect = ((1 + v[0] * data[i, 2]) ** v[1]
                  * (1 + v[2] * data[i, 4]) ** v[3]
                  * (1 + v[4] * data[i, 6] * max(data[i, 2], data[i, 4])) ** v[5])
        np.testing.assert_allclose(got[0], expect, rtol=1e-10)

    def test_pso_improves_over_generations(self):
        data = self._make_data()
        pso = PSO(ngen=4, pop_size=12, data=data,
                  rng=random.Random(0), verbose=False)
        pso.base_auc()
        assert pso.base is not None and len(pso.base) == 4
        best_fit, best_pos = pso.main()
        # must at least find something not-worse than a random start
        assert np.isfinite(best_fit)
        assert len(best_pos) == 6
        assert (best_pos >= np.array(pso.bound[0]) - 1e-9).all()
        assert (best_pos <= np.array(pso.bound[1]) + 1e-9).all()


def make_gauc_fixture(n=2000, users=40, seed=0):
    rng = np.random.default_rng(seed)
    heads = list(default_bound_x().keys())
    user_ids = rng.integers(0, users, n)
    quality = rng.uniform(size=n)
    scores = {}
    labels = {}
    for h in heads:
        s = np.clip(quality * 0.5 + rng.uniform(0, 0.5, n), 1e-4, 1)
        scores[h] = s
        if h == "staytime":
            labels[h] = quality * 100 + rng.normal(0, 10, n)
        else:
            labels[h] = (rng.uniform(size=n) < s).astype(float)
    return scores, labels, user_ids


class TestGauc:
    def test_group_size_filter(self):
        users = np.array([1] * 5 + [2] * 25 + [3] * 250)
        keep = filter_user_group_sizes(users, 20, 200)
        assert not keep[:5].any() and keep[5:30].all() and not keep[30:].any()

    def test_group_auc_skips_single_label_users(self):
        labels = np.array([1.0, 1.0, 1.0, 0.0, 1.0])
        preds = np.array([0.1, 0.9, 0.3, 0.2, 0.8])
        users = np.array([1, 1, 1, 2, 2])
        total, n = group_auc(labels, preds, users)
        assert n == 2                       # user 1 skipped (single label)
        np.testing.assert_allclose(total, 1.0 * 2)

    def test_mixed_score_formula(self):
        scores = {"a": np.array([0.5]), "b": np.array([0.2])}
        params = {"a": [2.0, 1.0, 4.0], "b": [1.0, 1.0, 10.0]}
        got = cal_mixed_score(params, scores)
        expect = ((1 + 4 * 0.5) ** 2 / 100) * ((1 + 10 * 0.2) / 10)
        np.testing.assert_allclose(got, [expect], rtol=1e-12)

    def test_engine_reward_and_gates(self):
        scores, labels, users = make_gauc_fixture()
        bound = default_bound_x()
        eng = GaucEngine(scores=scores, labels=labels, user_ids=users,
                         bound_x=bound, num_buckets=4)
        params = {h: bound[h]["param"] for h in bound}
        base = eng.mark_base(params)
        assert set(base) == set(bound)
        r, detail = eng.reward(params)
        # same params as base: all deltas 0 -> reward 0, no gate trips
        np.testing.assert_allclose(r, 0.0, atol=1e-9)
        # degrade the protected finish head -> hard gate returns -1
        bad = {h: list(bound[h]["param"]) for h in bound}
        bound["finish"]["gauc"] = 1.1      # unreachable base
        r2, d2 = eng.reward(bad)
        assert r2 == -1.0 and "finish" in d2


class TestGPSearch:
    def test_runs_tiny_end_to_end(self):
        scores, labels, users = make_gauc_fixture(n=600, users=12)
        eng = GaucEngine(scores=scores, labels=labels, user_ids=users,
                         bound_x=default_bound_x(), num_buckets=2)
        search = GPSearch(eng, pop_size=4, ngen=2, gaussian_ngen=3,
                          rng=random.Random(0))
        best_params, best_y = search.run()
        assert set(best_params) == set(default_bound_x())
        assert all(len(v) == 3 for v in best_params.values())
        assert np.isfinite(best_y)
        # sum-a simplex constraint honored
        assert sum(v[0] for v in best_params.values()) <= 30.0 + 1e-6


class TestReader:
    def test_parse_line_and_skip(self, tmp_path):
        good = "\t".join(["1", "2", "3", "0.1", "0.2", "0.3", "0.4", "5.0",
                          "7.0", "1", "0", "2", "0"])
        bad = good.replace("0.2", "\\N")
        path = tmp_path / "log.tsv"
        path.write_text(good + "\n" + bad + "\n")
        rows = Reader(str(path)).parse_lines(sample_rate=1.1)
        assert len(rows) == 1
        np.testing.assert_allclose(rows[0], [5.0, 7.0, 0.1, 1, 0.2 * 0.3, 1, 0.4, 0])


class TestDurationBucketedReward:
    def test_reward_v2_parts_and_gates(self):
        from recommendsystem_tpu.search.gauc import DurationBucketedGaucEngine
        scores, labels, users = make_gauc_fixture(n=3000, users=40)
        rng = np.random.default_rng(3)
        duration = rng.integers(0, 2, 3000)
        bound = default_bound_x()
        eng = DurationBucketedGaucEngine(scores=scores, labels=labels,
                                         user_ids=users,
                                         duration_bucket=duration,
                                         bound_x=bound, num_buckets=4)
        params = {h: bound[h]["param"] for h in bound}
        eng.mark_base(params)
        assert "gauc_0" in bound["finish"] and "gauc_1" in bound["finish"]
        r, detail = eng.reward_v2(params)
        np.testing.assert_allclose(r, 0.0, atol=1e-9)    # zero deltas vs base
        # tripping the protected finish head in part 1 gates to -1
        bound["finish"]["gauc_1"] = 1.5
        r2, d2 = eng.reward_v2(params)
        assert r2 == -1.0 and "finish" in d2
