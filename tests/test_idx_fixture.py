"""Real-data ingestion proof on the committed IDX fixture (VERDICT r3 #6).

`tests/fixtures/mnist_idx*` holds genuine handwritten-digit scans (sklearn's
UCI `load_digits` corpus — the only real digit data reachable in this
zero-egress environment; see tools/make_idx_fixture.py) encoded in the exact
IDX byte format the reference's torchvision loader consumes
(`mnist/data_utils.py:15`).  These tests pin the THREE decode paths —
native C++ (`cfgan/native/idx_loader.cpp`), pure-python struct fallback,
and gzip — byte-identical on those real files, and the full `load_mnist`
pipeline landing exactly in [-1, 1].
"""
import os
import struct

import numpy as np
import pytest

from cfgan import native
from cfgan.data import mnist as mnist_mod

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
RAW = os.path.join(FIX, "mnist_idx")
GZ = os.path.join(FIX, "mnist_idx_gz")
STEMS = ("train-images-idx3-ubyte", "train-labels-idx1-ubyte",
         "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")


def python_decode(path: str) -> np.ndarray:
    """The struct-based fallback, inlined so it cannot silently route
    through the native decoder."""
    with open(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(dims)


@pytest.mark.parametrize("stem", STEMS)
def test_three_decode_paths_byte_identical(stem):
    raw_path = os.path.join(RAW, stem)
    py = python_decode(raw_path)
    # gzip path: _read_idx never uses the native decoder for .gz
    gz = mnist_mod._read_idx(os.path.join(GZ, stem + ".gz"))
    np.testing.assert_array_equal(py, gz)
    assert gz.dtype == np.uint8
    if native.lib() is None:
        pytest.skip("native build unavailable")
    nat = native.read_idx(raw_path)
    assert nat is not None
    np.testing.assert_array_equal(py, nat)


def test_fixture_shapes_and_content():
    xtr = python_decode(os.path.join(RAW, "train-images-idx3-ubyte"))
    ytr = python_decode(os.path.join(RAW, "train-labels-idx1-ubyte"))
    assert xtr.shape == (120, 28, 28) and ytr.shape == (120,)
    # 4 samples per class, real scans (non-trivial pixel distribution)
    assert sorted(np.bincount(ytr, minlength=10)) == [12] * 10
    assert xtr.max() == 255 and xtr.min() == 0
    assert 2 < len(np.unique(xtr)) <= 17  # 17 grey levels from [0,16] source


def test_load_mnist_end_to_end_on_real_files():
    (xtr, ytr), (xva, yva), (xte, yte) = mnist_mod.load_mnist(
        path=RAW, seed=42, valid_fraction=0.1)
    assert xtr.shape == (108, 28, 28, 1) and xva.shape == (12, 28, 28, 1)
    assert xte.shape == (20, 28, 28, 1)
    assert ytr.dtype == np.int32
    # Normalize((.5),(.5)) contract: byte 0 -> -1.0 and byte 255 -> +1.0
    allx = np.concatenate([xtr.ravel(), xva.ravel(), xte.ravel()])
    assert allx.min() == -1.0 and allx.max() == 1.0
    # exact value mapping vs the raw fixture bytes (split permutes rows,
    # so compare the sorted multisets of one image's worth of values)
    raw = python_decode(os.path.join(RAW, "t10k-images-idx3-ubyte"))
    want = ((raw.astype(np.float32) / 255.0) - 0.5) / 0.5
    np.testing.assert_array_equal(xte[..., 0], want)
    np.testing.assert_array_equal(
        yte, python_decode(os.path.join(RAW, "t10k-labels-idx1-ubyte")))


def test_gz_only_directory_loads():
    """A directory holding only .gz members must load via _find's suffix
    search (the torchvision download layout keeps both; servers ship gz)."""
    (xtr, ytr), _, (xte, yte) = mnist_mod.load_mnist(
        path=GZ, seed=0, valid_fraction=0.1)
    assert xtr.shape[0] == 108 and xte.shape[0] == 20
