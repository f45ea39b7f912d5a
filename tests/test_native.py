"""Native (C++) data-path kernels: build, parity with the Python fallbacks,
and graceful degradation."""
import gzip
import os
import struct

import numpy as np
import pytest

from cfgan import native


def _write_idx(path, arr: np.ndarray):
    with open(path, "wb") as f:
        f.write(bytes([0, 0, 0x08, arr.ndim]))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


@pytest.fixture(scope="module")
def built():
    if native.lib() is None:
        pytest.skip("no g++ / native build unavailable")
    return True


def test_read_idx_parity(built, tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (7, 9, 5), dtype=np.uint8)
    p = str(tmp_path / "t.idx")
    _write_idx(p, arr)
    got = native.read_idx(p)
    np.testing.assert_array_equal(got, arr)

    # the mnist loader front-end picks the same bytes up
    from cfgan.data.mnist import _read_idx

    np.testing.assert_array_equal(_read_idx(p), arr)


def test_read_idx_rejects_gz_and_garbage(built, tmp_path):
    p = str(tmp_path / "t.idx.gz")
    with gzip.open(p, "wb") as f:
        f.write(b"\x00\x00\x08\x01\x00\x00\x00\x02ab")
    assert native.read_idx(p) is None  # gz -> python fallback territory
    bad = str(tmp_path / "bad.idx")
    with open(bad, "wb") as f:
        f.write(b"\xff\xff\xff\xff garbage")
    assert native.read_idx(bad) is None


def test_read_idx_rejects_oversized_ndim_and_overflow(built, tmp_path):
    """ndim is a file-controlled byte; anything > 8 would overrun the
    8-slot dims buffer (heap corruption) — must be rejected up front, and
    dim products that overflow int64 must be rejected too."""
    import ctypes

    big_ndim = str(tmp_path / "big_ndim.idx")
    with open(big_ndim, "wb") as f:
        f.write(bytes([0, 0, 0x08, 255]))
        f.write(struct.pack(">I", 2) * 255)
        f.write(b"\x00" * 4)
    assert native.read_idx(big_ndim) is None

    # drive the C entry point directly with the hostile header: it must
    # return a header error without touching dims beyond 8 slots
    L = native.lib()
    out = np.empty(16, np.uint8)
    dims = (ctypes.c_longlong * 8)()
    ndim = ctypes.c_int(0)
    rc = L.idx_read(
        big_ndim.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.size, dims, ctypes.byref(ndim),
    )
    assert rc == -2

    overflow = str(tmp_path / "overflow.idx")
    with open(overflow, "wb") as f:
        f.write(bytes([0, 0, 0x08, 8]))
        f.write(struct.pack(">I", 0xFFFFFFFF) * 8)  # product >> 2^63
    rc = L.idx_read(
        overflow.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out.size, dims, ctypes.byref(ndim),
    )
    assert rc == -2


def test_normalize_parity(built):
    rng = np.random.RandomState(1)
    x = rng.randint(0, 256, (3, 28, 28), dtype=np.uint8)
    got = native.normalize_u8(x, 0.5, 0.5)
    want = ((x.astype(np.float32) / 255.0) - 0.5) / 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32

    big = rng.randint(0, 256, (4 << 20,), dtype=np.uint8)  # multithreaded path
    np.testing.assert_allclose(
        native.normalize_u8(big, 0.5, 0.5),
        ((big.astype(np.float32) / 255.0) - 0.5) / 0.5, atol=1e-6,
    )
