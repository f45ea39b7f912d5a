"""Generate the committed real-data IDX fixture (tests/fixtures/mnist_idx*).

VERDICT r3 missing #2: the IDX/NPZ loaders (`cfgan/data/mnist.py:34-77`) had
never been exercised against real files in this zero-egress environment.
Genuine MNIST bytes are unobtainable here, so the fixture uses the closest
genuinely-real source on the host: sklearn's `load_digits` corpus (real
handwritten digit scans from the UCI optical-recognition dataset), upsampled
8x8 -> 24x24 (x3 nearest) and zero-padded to MNIST's 28x28 geometry, then
encoded into byte-exact IDX format (magic 0x0000080{1,3}, big-endian dims —
the format of `train-images-idx3-ubyte` that the reference's torchvision
loader consumes, `mnist/data_utils.py:15`).

Layout written:
  tests/fixtures/mnist_idx/     raw IDX files (120 train / 20 test)
  tests/fixtures/mnist_idx_gz/  the same payloads, gzip members only

Deterministic: running this script again reproduces the committed bytes.
"""
from __future__ import annotations

import gzip
import os
import struct

import numpy as np
from sklearn.datasets import load_digits

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def to_28x28(img8: np.ndarray) -> np.ndarray:
    """8x8 [0,16] -> 28x28 uint8 [0,255]: x3 nearest upsample + 2px pad."""
    big = np.repeat(np.repeat(img8, 3, 0), 3, 1)  # 24x24
    out = np.zeros((28, 28), np.float64)
    out[2:26, 2:26] = big
    return np.round(out * (255.0 / 16.0)).astype(np.uint8)


def write_idx_images(path: str, imgs: np.ndarray) -> None:
    n, h, w = imgs.shape
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 0x00000803, n, h, w))
        f.write(imgs.tobytes())


def write_idx_labels(path: str, labels: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 0x00000801, len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


def main() -> None:
    digits = load_digits()
    x, y = digits.images, digits.target
    # 12 train + 2 test samples per class, taken in dataset order (the
    # stratified 10% valid split in load_mnist needs >= 1 sample per class
    # in the validation fold: 120 * 0.1 = 12 >= 10 classes)
    tr_idx, te_idx = [], []
    for cls in range(10):
        where = np.where(y == cls)[0]
        tr_idx.extend(where[:12])
        te_idx.extend(where[12:14])
    xtr = np.stack([to_28x28(x[i]) for i in tr_idx])
    ytr = y[np.array(tr_idx)]
    xte = np.stack([to_28x28(x[i]) for i in te_idx])
    yte = y[np.array(te_idx)]

    raw = os.path.join(OUT, "mnist_idx")
    gz = os.path.join(OUT, "mnist_idx_gz")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(gz, exist_ok=True)
    files = {
        "train-images-idx3-ubyte": (write_idx_images, xtr),
        "train-labels-idx1-ubyte": (write_idx_labels, ytr),
        "t10k-images-idx3-ubyte": (write_idx_images, xte),
        "t10k-labels-idx1-ubyte": (write_idx_labels, yte),
    }
    for name, (writer, arr) in files.items():
        p = os.path.join(raw, name)
        writer(p, arr)
        with open(p, "rb") as f:
            payload = f.read()
        # mtime=0 for byte-reproducible gzip members
        with open(os.path.join(gz, name + ".gz"), "wb") as f:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as zf:
                zf.write(payload)
        print(f"{name}: {len(payload)} bytes "
              f"(shape {arr.shape}, labels {sorted(set(arr.reshape(-1)))[:3]}...)"
              if arr.ndim == 1 else f"{name}: {len(payload)} bytes {arr.shape}")


if __name__ == "__main__":
    main()
