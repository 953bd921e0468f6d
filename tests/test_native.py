"""Native C++ data-plane kernel tests (skip if no toolchain)."""

import numpy as np
import pytest

from pepflowww_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++/zlib unavailable; native lib not built")
    return lib


def test_decompress_batch_roundtrip(lib):
    import zlib

    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 255, size=n, dtype=np.uint8).tobytes()
                for n in (10, 1000, 65536)]
    blobs = [zlib.compress(p, 1) for p in payloads]
    out = native.decompress_batch(blobs, [len(p) + 64 for p in payloads])
    assert out == payloads


def test_decompress_batch_matches_store(tmp_path, lib):
    from pepflowww_tpu.data import recordstore

    path = str(tmp_path / "s.rec")
    with recordstore.RecordStoreWriter(path) as w:
        for i in range(10):
            w.put(f"k{i}", {"x": np.full((i + 1, 3), i, dtype=np.float32)})
    rs = recordstore.RecordStore(path)
    many = rs.get_many([f"k{i}" for i in range(10)])
    for i, item in enumerate(many):
        np.testing.assert_array_equal(item["x"], np.full((i + 1, 3), i, dtype=np.float32))


def test_pad_stack_f32(lib):
    rng = np.random.default_rng(1)
    items = [rng.normal(size=(n, 15, 3)).astype(np.float32) for n in (3, 7, 5)]
    out = native.pad_stack_f32(items, pad_to=8)
    assert out.shape == (3, 8, 15, 3)
    for i, it in enumerate(items):
        np.testing.assert_array_equal(out[i, : it.shape[0]], it)
        assert np.all(out[i, it.shape[0]:] == 0)


def test_pad_stack_fallback_equivalence():
    rng = np.random.default_rng(2)
    items = [rng.normal(size=(n, 4)).astype(np.float32) for n in (2, 6)]
    native_out = native.pad_stack_f32(items, pad_to=6, pad_value=0.0)
    ref = np.zeros((2, 6, 4), dtype=np.float32)
    for i, it in enumerate(items):
        ref[i, : it.shape[0]] = it
    np.testing.assert_array_equal(native_out, ref)
