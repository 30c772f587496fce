"""C++ native data loader tests: hashing parity with the Python path, batch
parity with the pure-Python pipeline, CRC behaviour."""

import ctypes
import os

import numpy as np
import pytest

from recommendsystem_tpu.data.example_proto import encode_example
from recommendsystem_tpu.data.native_loader import (
    NativeRecordLoader, get_lib, native_available)
from recommendsystem_tpu.data.parse import decode_batch, examples_to_batch
from recommendsystem_tpu.data.tfrecord import crc32c, write_tfrecord
from recommendsystem_tpu.embedding import (
    EmbeddingFeatures, SparseAdam, category_column, embedding_column)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


def make_engine(slots=("10", "11"), bucket=1000, seq_slot="10"):
    cols = []
    for s in slots:
        cat = category_column(s, bucket)
        cols.append(embedding_column(cat, 8, combiner="mean"))
        if s == seq_slot:
            cols.append(embedding_column(cat, 8, combiner=None, seq_max_len=6,
                                         name=f"seq_{s}"))
    return EmbeddingFeatures(cols, SparseAdam())


def write_files(tmp_path, n_files=2, per_file=10, seed=0):
    rng = np.random.default_rng(seed)
    files = []
    all_examples = []
    for fi in range(n_files):
        recs = []
        for i in range(per_file):
            feats = {"watch_duration": [int(rng.integers(0, 60000))]}
            for s in ("10", "11"):
                feats[s] = rng.integers(0, 2 ** 62, rng.integers(1, 5)).tolist()
            recs.append(encode_example(feats))
            all_examples.append(feats)
        path = str(tmp_path / f"part-{fi}.tfrecord")
        write_tfrecord(path, recs)
        files.append(path)
    return files, all_examples


class TestNative:
    def test_splitmix64_matches_python(self):
        lib = get_lib()
        from recommendsystem_tpu.embedding.feature_column import _splitmix64
        for v in [0, 1, 2 ** 62, 123456789, 2 ** 64 - 1]:
            got = lib.rec_splitmix64(ctypes.c_uint64(v))
            want = int(_splitmix64(np.array([v], dtype=np.uint64))[0])
            assert got == want, v

    def test_crc32c_matches_python(self):
        lib = get_lib()
        data = b"123456789"
        got = lib.rec_crc32c(data, len(data))
        assert got == crc32c(data) == 0xE3069283

    def test_batches_match_python_pipeline(self, tmp_path):
        engine = make_engine()
        files, _ = write_files(tmp_path)
        loader = NativeRecordLoader(files, engine, batch_size=8,
                                    ids_per_feature=4,
                                    scalar_features=["watch_duration"],
                                    cycle_length=1, block_length=100)
        native_batches = list(loader)
        assert sum(b[0]["10"].rows.shape[0] for b in native_batches) == 20

        # python path over the same files, same interleave order
        from recommendsystem_tpu.data.loader import interleave_records, batched
        raw = list(interleave_records(files, cycle_length=1, block_length=100))
        py_batches = [examples_to_batch(decode_batch(rb), engine, 4)
                      for rb in batched(raw, 8)]

        for (nb, scal), pb in zip(native_batches, py_batches):
            for key in engine.columns:
                np.testing.assert_array_equal(nb[key].rows, pb[key].rows, key)
                np.testing.assert_array_equal(nb[key].mask, pb[key].mask, key)
        np.testing.assert_array_equal(
            native_batches[0][1]["watch_duration"].shape, (8,))

    def test_corrupt_record_stops_cleanly(self, tmp_path):
        engine = make_engine()
        files, _ = write_files(tmp_path, n_files=1, per_file=5)
        raw = bytearray(open(files[0], "rb").read())
        raw[30] ^= 0xFF     # flip a byte inside the first record's payload
        open(files[0], "wb").write(bytes(raw))
        loader = NativeRecordLoader(files, engine, batch_size=4,
                                    verify_crc=True)
        total = sum(b["10"].rows.shape[0] for b, _ in loader)
        assert total < 5    # corrupted tail dropped, no crash


def test_native_writer_roundtrips_with_python_reader(tmp_path):
    from recommendsystem_tpu.data.native_loader import NativeRecordWriter
    from recommendsystem_tpu.data.tfrecord import read_tfrecord
    path = str(tmp_path / "w.tfrecord")
    recs = [b"alpha", b"", b"x" * 500, encode_example({"5": [1, 2, 3]})]
    with NativeRecordWriter(path) as w:
        for r in recs:
            w.write(r)
    got = list(read_tfrecord(path, verify_crc=True))   # python CRC check
    assert got == recs


def test_cxx_parser_survives_fuzzed_records(tmp_path):
    """Random bytes framed as valid TFRecords must not crash the C++ parser
    (bounds-checked spans); real records around them still parse."""
    import os as _os
    engine = make_engine()
    rng = np.random.default_rng(7)
    good = encode_example({"10": [1, 2], "11": [3], "watch_duration": [5]})
    recs = [good]
    for _ in range(200):
        recs.append(bytes(rng.integers(0, 256, rng.integers(1, 120),
                                       dtype=np.uint8)))
    recs.append(good)
    path = str(tmp_path / "fuzz.tfrecord")
    write_tfrecord(path, recs)
    loader = NativeRecordLoader([path], engine, batch_size=32,
                                scalar_features=["watch_duration"],
                                verify_crc=True)
    total = 0
    for batch, scalars in loader:
        total += batch["10"].rows.shape[0]
    assert total == 202          # every record consumed, no crash
