"""Data-layer tests: TFRecord container, tf.Example codec, pipeline stages,
staytime label engineering parity, end-to-end file->batch parsing."""

import math
import os

import numpy as np
import pytest

from recommendsystem_tpu.data.example_proto import decode_example, encode_example
from recommendsystem_tpu.data.loader import (
    Prefetcher, batched, dataset_reader, interleave_records, list_files,
    shard_files)
from recommendsystem_tpu.data.parse import examples_to_batch, make_staytime_parse_fn
from recommendsystem_tpu.data.staytime_labels import (
    BIN_LIST, SIGMA, WIDTH, staytime_labels)
from recommendsystem_tpu.data.tfrecord import (
    crc32c, masked_crc32c, read_tfrecord, write_tfrecord)


class TestTFRecord:
    def test_crc32c_known_vectors(self):
        # RFC 3720 test vectors
        assert crc32c(b"") == 0x0
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"123456789") == 0xE3069283

    def test_roundtrip_with_crc(self, tmp_path):
        path = str(tmp_path / "a.tfrecord")
        recs = [b"hello", b"", b"x" * 1000]
        assert write_tfrecord(path, recs) == 3
        got = list(read_tfrecord(path, verify_crc=True))
        assert got == recs

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "a.tfrecord")
        write_tfrecord(path, [b"hello world"])
        raw = bytearray(open(path, "rb").read())
        raw[14] ^= 0xFF
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(read_tfrecord(path, verify_crc=True))


class TestExampleProto:
    def test_roundtrip(self):
        feats = {
            "slot_1": [1, 2, 3],
            "neg": [-5],
            "big": [2 ** 62],
            "wt": [1.5, 2.5],
            "name": [b"abc", b"def"],
        }
        enc = encode_example(feats)
        dec = decode_example(enc)
        assert dec["slot_1"] == [1, 2, 3]
        assert dec["neg"] == [-5]
        assert dec["big"] == [2 ** 62]
        np.testing.assert_allclose(dec["wt"], [1.5, 2.5])
        assert dec["name"] == [b"abc", b"def"]

    def test_tf_parity(self):
        """Our codec must be wire-compatible with tf.train.Example."""
        tf = pytest.importorskip("tensorflow")
        ex = tf.train.Example(features=tf.train.Features(feature={
            "ids": tf.train.Feature(int64_list=tf.train.Int64List(value=[7, -1, 9])),
            "w": tf.train.Feature(float_list=tf.train.FloatList(value=[0.25])),
            "s": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"hi"])),
        }))
        dec = decode_example(ex.SerializeToString())
        assert dec["ids"] == [7, -1, 9]
        np.testing.assert_allclose(dec["w"], [0.25])
        assert dec["s"] == [b"hi"]
        # and the reverse direction
        parsed = tf.train.Example.FromString(
            encode_example({"ids": [7, -1, 9], "w": [0.25], "s": [b"hi"]}))
        assert list(parsed.features.feature["ids"].int64_list.value) == [7, -1, 9]


class TestLoader:
    def _write_day_files(self, tmp_path, days=("20260801", "20260802"), per_day=3):
        from recommendsystem_tpu.data.tfrecord import write_tfrecord
        n = 0
        for day in days:
            os.makedirs(tmp_path / day)
            for i in range(per_day):
                recs = [f"{day}-{i}-{j}".encode() for j in range(4)]
                write_tfrecord(str(tmp_path / day / f"part-{i}.tfrecord"), recs)
                n += len(recs)
        return n

    def test_list_and_shard(self, tmp_path):
        self._write_day_files(tmp_path)
        files = list_files(str(tmp_path), days=["20260801", "20260802"],
                           match_pattern="part-*")
        assert len(files) == 6
        s0 = shard_files(files, 2, 0)
        s1 = shard_files(files, 2, 1)
        assert len(s0) == 3 and len(s1) == 3 and not set(s0) & set(s1)

    def test_interleave_covers_all(self, tmp_path):
        self._write_day_files(tmp_path)
        files = list_files(str(tmp_path), days=["20260801"], match_pattern="*")
        recs = list(interleave_records(files, cycle_length=2, block_length=2))
        assert len(recs) == 12
        assert len(set(recs)) == 12

    def test_batched_and_prefetch(self):
        out = list(Prefetcher(batched(range(10), 4)))
        assert [len(b) for b in out] == [4, 4, 2]

    def test_prefetcher_propagates_errors(self):
        def gen():
            yield 1
            raise RuntimeError("boom")
        it = iter(Prefetcher(gen()))
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            next(it)


class TestStaytimeLabels:
    def test_thresholds(self):
        labels, w = staytime_labels(np.array([6999, 7001, 18001]))
        np.testing.assert_array_equal(labels["shortplay"][:, 0], [0, 1, 1])
        np.testing.assert_array_equal(labels["longplay"][:, 0], [0, 0, 1])

    def test_gaussian_distribution(self):
        wt_ms = np.array([30_000])            # 30 s
        labels, _ = staytime_labels(wt_ms)
        dist = labels["staytime"][0, :400]
        # peak at the bin closest to 30s
        peak = np.argmax(dist)
        assert abs(BIN_LIST[peak] - 30.0) <= 0.25
        # exact formula at the peak bin
        d = BIN_LIST[peak] - 30.0
        expect = math.exp(-(d ** 2) / (2 * SIGMA ** 2)) / (math.sqrt(2 * math.pi) * SIGMA) * WIDTH
        np.testing.assert_allclose(dist[peak], expect, rtol=1e-5)
        # last column carries the clipped wt in seconds
        assert labels["staytime"][0, 400] == 30.0

    def test_wt_clip_160s(self):
        labels, _ = staytime_labels(np.array([1_000_000]))
        assert labels["staytime"][0, 400] == 160.0

    def test_homepage_weight(self):
        _, w = staytime_labels(np.array([1000, 1000]),
                               np.array(["xx_video_homepage_landing_yy", "other"]))
        np.testing.assert_array_equal(w[:, 0], [5.0, 1.0])


class TestEndToEndParse:
    def test_staytime_pipeline(self, tmp_path):
        from recommendsystem_tpu.models import create_model
        from recommendsystem_tpu.models.staytime import StaytimeConfig

        cfg = StaytimeConfig(bucket_size=128, seq_max_len=4)
        bundle = create_model("staytime", cfg=cfg)

        rng = np.random.default_rng(0)
        day = tmp_path / "20260801"
        os.makedirs(day)
        recs = []
        for i in range(32):
            feats = {"extra_info": [f"req{i}".encode()],
                     "video_duration": [int(rng.integers(5_000, 60_000))],
                     "watch_duration": [int(rng.integers(0, 60_000))]}
            for s in cfg.slots:
                feats[s] = rng.integers(0, 2 ** 60, rng.integers(1, 4)).tolist()
            recs.append(encode_example(feats))
        write_tfrecord(str(day / "part-0.tfrecord"), recs)

        parse_fn = make_staytime_parse_fn(bundle.embedding)
        ds = dataset_reader(str(tmp_path), ["20260801"], "part-*", batch_size=16,
                            parse_fn=parse_fn)
        batches = list(ds)
        assert len(batches) == 2
        batch, dense, labels, weight, extras = batches[0]
        assert set(batch) == set(bundle.embedding.columns)
        for s in cfg.seq_slots:
            assert batch[f"seq_{s}"].rows.shape == (16, 4)
        assert labels[f"video_id_rank_staytime_mtl_ppnet_v7_staytime"].shape == (16, 401)
        assert extras["example_id"][0] == "req0"

        # batches feed straight into the model
        import jax
        variables, tables = bundle.init(jax.random.PRNGKey(0), batch)
        out = bundle.forward(variables, bundle.embedding.weights(tables), batch)
        assert out[f"video_id_rank_staytime_mtl_ppnet_v7_staytime"].shape == (16, 401)


class TestBalanceBatches:
    def test_pads_short_final_batch(self):
        import numpy as np
        from recommendsystem_tpu.data.loader import balance_batches
        b = {"f": np.arange(10).reshape(5, 2)}
        labels = {"t": np.ones((5, 1))}
        w = np.ones((5, 1))
        out = list(balance_batches([(b, None, labels, w)], batch_size=8))
        (b2, d2, l2, w2), = out
        assert b2["f"].shape == (8, 2)
        assert w2.shape == (8, 1)
        assert w2[:5].sum() == 5 and w2[5:].sum() == 0   # pad rows weightless


class TestMalformedRecords:
    def test_decode_batch_skips_garbage(self):
        import os
        from recommendsystem_tpu.data.parse import decode_batch
        good = encode_example({"5": [1, 2]})
        rng_bytes = [os.urandom(37) for _ in range(20)]
        out = decode_batch([good] + rng_bytes + [good])
        assert out[0] == {"5": [1, 2]} and out[-1] == {"5": [1, 2]}
        assert len(out) == 22           # malformed rows kept as empty dicts
        assert all(isinstance(d, dict) for d in out)
