"""MNIST loading: real IDX/NPZ files when present, synthetic fallback otherwise.

The reference pulls MNIST through torchvision from `/mnt/data`
(`mnist/data_utils.py:15`).  This environment has zero egress, so:

* If `CFGAN_DATA_DIR` (or an explicit path) contains the standard IDX files
  (`train-images-idx3-ubyte[.gz]`, ...) or a keras-style `mnist.npz`, they are
  loaded directly — no torchvision dependency.
* Otherwise a deterministic synthetic digit corpus is generated: one rendered
  glyph per class, randomly affine-jittered (rotation/scale/translation) with
  pixel noise.  Same shapes/splits/value range as real MNIST, fully learnable
  by the CNN classifier, and sufficient for training, eval and benchmarks.

Returned splits mirror `mnist/data_utils.py:6-32`: stratified 90/10
train/valid over the train set, plus the test set; images NHWC float32 in
[-1, 1] (Normalize((.5), (.5))).
"""
from __future__ import annotations

import gzip
import os
import struct

import numpy as np
from sklearn.model_selection import train_test_split

_CACHE = os.path.expanduser("~/.cache/cfgan")

TRAIN_N = 60000
TEST_N = 10000


# ---------------------------------------------------------------- real MNIST
def _read_idx(path: str) -> np.ndarray:
    from cfgan import native

    fast = native.read_idx(path)  # C++ decoder; None -> python fallback
    if fast is not None:
        return fast
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(dims)


def _find(base: str, stem: str) -> str | None:
    for suffix in ("", ".gz"):
        for name in (stem + suffix, stem.replace("-idx", ".idx") + suffix):
            p = os.path.join(base, name)
            if os.path.exists(p):
                return p
    return None


def _load_real(data_dir: str):
    npz = os.path.join(data_dir, "mnist.npz")
    if os.path.exists(npz):
        with np.load(npz) as z:
            return (z["x_train"], z["y_train"].astype(np.int32)), (
                z["x_test"],
                z["y_test"].astype(np.int32),
            )
    stems = {
        "xtr": "train-images-idx3-ubyte",
        "ytr": "train-labels-idx1-ubyte",
        "xte": "t10k-images-idx3-ubyte",
        "yte": "t10k-labels-idx1-ubyte",
    }
    paths = {k: _find(data_dir, s) for k, s in stems.items()}
    if all(paths.values()):
        return (
            (_read_idx(paths["xtr"]), _read_idx(paths["ytr"]).astype(np.int32)),
            (_read_idx(paths["xte"]), _read_idx(paths["yte"]).astype(np.int32)),
        )
    return None


# ----------------------------------------------------------- synthetic MNIST
# Font/weight/style variants rendered per digit.  One glyph per class (v1)
# made the corpus trivially separable (CNN test acc 0.9999 — flagged in the
# round-1 review); multiple typefaces + elastic distortion + stroke-weight
# variation bring the classifier to realistic real-MNIST-like accuracy.
_FONT_VARIANTS = (
    ("DejaVu Sans", "normal", "normal"),
    ("DejaVu Sans", "bold", "normal"),
    ("DejaVu Sans", "normal", "italic"),
    ("DejaVu Serif", "normal", "normal"),
    ("DejaVu Serif", "bold", "normal"),
    ("DejaVu Serif", "normal", "italic"),
    ("DejaVu Sans Mono", "normal", "normal"),
    ("DejaVu Sans Mono", "bold", "normal"),
    ("STIXGeneral", "normal", "normal"),
    ("STIXGeneral", "bold", "normal"),
    ("STIXGeneral", "normal", "italic"),
    ("cmr10", "normal", "normal"),
    ("cmss10", "normal", "normal"),
    ("cmb10", "normal", "normal"),
)


def _render_glyphs(size: int = 56) -> np.ndarray:
    """Render digits 0-9 in every font variant with matplotlib into
    (n_variants, 10, size, size) in [0,1]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nv = len(_FONT_VARIANTS)
    glyphs = np.zeros((nv, 10, size, size), np.float32)
    for v, (family, weight, style) in enumerate(_FONT_VARIANTS):
        for d in range(10):
            fig = plt.figure(figsize=(1, 1), dpi=size)
            fig.patch.set_facecolor("black")
            ax = fig.add_axes([0, 0, 1, 1])
            ax.set_facecolor("black")
            ax.axis("off")
            ax.text(
                0.5,
                0.475,
                str(d),
                color="white",
                fontsize=int(size * 0.82),
                ha="center",
                va="center",
                family=family,
                weight=weight,
                style=style,
            )
            fig.canvas.draw()
            buf = (
                np.asarray(fig.canvas.buffer_rgba())[..., 0].astype(np.float32)
                / 255.0
            )
            plt.close(fig)
            glyphs[v, d] = buf[:size, :size]
    return glyphs


def _upsample_matrix(coarse: int, out: int) -> np.ndarray:
    """(out, coarse) bilinear interpolation matrix mapping a coarse grid to
    `out` points (used to build smooth per-sample elastic fields)."""
    U = np.zeros((out, coarse), np.float32)
    pos = np.linspace(0, coarse - 1, out)
    lo = np.floor(pos).astype(np.int32)
    hi = np.minimum(lo + 1, coarse - 1)
    frac = (pos - lo).astype(np.float32)
    U[np.arange(out), lo] += 1 - frac
    U[np.arange(out), hi] += frac
    return U


def _warp_sample(glyphs, variants, labels, thetas, scales, tx, ty,
                 disp=None, out: int = 28):
    """Vectorized bilinear sampling of per-sample affine (+elastic)
    transforms.  `disp` is an optional (n, out, out, 2) displacement field
    in output-pixel units (elastic distortion)."""
    n = labels.shape[0]
    gsize = glyphs.shape[-1]
    cy_out = (out - 1) / 2.0
    cy_in = (gsize - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(out), np.arange(out), indexing="ij")
    base = np.stack([yy - cy_out, xx - cy_out], -1).reshape(-1, 2).astype(np.float32)
    if disp is not None:
        base = base[None] + disp.reshape(n, -1, 2)
    else:
        base = np.broadcast_to(base[None], (n,) + base.shape)

    cos, sin = np.cos(thetas), np.sin(thetas)
    # inverse rotation then inverse scale, glyph is ~2x the output resolution
    factor = (gsize / out) / scales
    rot = np.stack(
        [np.stack([cos, -sin], -1), np.stack([sin, cos], -1)], -2
    )  # (n,2,2)
    coords = np.einsum("npk,nkj->npj", base, rot) * factor[:, None, None]
    coords[..., 0] += cy_in + ty[:, None] * (gsize / out)
    coords[..., 1] += cy_in + tx[:, None] * (gsize / out)

    y0 = np.floor(coords[..., 0]).astype(np.int32)
    x0 = np.floor(coords[..., 1]).astype(np.int32)
    fy = coords[..., 0] - y0
    fx = coords[..., 1] - x0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < gsize) & (xi >= 0) & (xi < gsize)
        yi = np.clip(yi, 0, gsize - 1)
        xi = np.clip(xi, 0, gsize - 1)
        vals = glyphs[variants[:, None], labels[:, None], yi, xi]
        return vals * valid

    v = (
        gather(y0, x0) * (1 - fy) * (1 - fx)
        + gather(y0, x0 + 1) * (1 - fy) * fx
        + gather(y0 + 1, x0) * fy * (1 - fx)
        + gather(y0 + 1, x0 + 1) * fy * fx
    )
    return v.reshape(n, out, out)


def synthesize(n: int, seed: int, glyphs: np.ndarray | None = None):
    """Deterministic handwriting-like corpus: random typeface variant per
    sample, affine jitter (rotation/scale/translation), smooth ELASTIC
    distortion (coarse random displacement grid bilinearly upsampled — the
    classic MNIST augmentation), stroke-weight variation via gamma, pixel
    noise and intensity scaling."""
    rng = np.random.RandomState(seed)
    if glyphs is None:
        glyphs = _render_glyphs()
    nv = glyphs.shape[0]
    labels = rng.randint(0, 10, n).astype(np.int32)
    variants = rng.randint(0, nv, n).astype(np.int32)
    thetas = rng.uniform(-0.26, 0.26, n).astype(np.float32)  # ~15 deg
    scales = rng.uniform(0.75, 1.05, n).astype(np.float32)
    tx = rng.uniform(-2.5, 2.5, n).astype(np.float32)
    ty = rng.uniform(-2.5, 2.5, n).astype(np.float32)
    # elastic: per-sample 5x5 displacement grid, upsampled to 28x28
    coarse = 5
    alpha = rng.uniform(0.3, 2.0, (n, 1, 1, 1)).astype(np.float32)
    grid = rng.normal(0.0, 1.0, (n, coarse, coarse, 2)).astype(np.float32)
    U = _upsample_matrix(coarse, 28)
    disp = np.einsum("ij,njkc,lk->nilc", U, grid * alpha, U)
    # stroke weight: gamma < 1 thickens antialiased strokes, > 1 thins
    gamma = rng.uniform(0.6, 1.7, (n, 1, 1)).astype(np.float32)

    imgs = np.zeros((n, 28, 28), np.float32)
    for lo in range(0, n, 8192):
        hi = min(n, lo + 8192)
        imgs[lo:hi] = _warp_sample(
            glyphs, variants[lo:hi], labels[lo:hi], thetas[lo:hi],
            scales[lo:hi], tx[lo:hi], ty[lo:hi], disp[lo:hi],
        )
    imgs = np.power(np.clip(imgs, 0.0, 1.0), gamma)
    imgs += rng.normal(0.0, 0.04, imgs.shape).astype(np.float32)
    imgs *= rng.uniform(0.7, 1.0, (n, 1, 1)).astype(np.float32)
    imgs = np.clip(imgs, 0.0, 1.0)
    return (imgs * 255).astype(np.uint8), labels


def _load_synthetic(seed: int = 0):
    os.makedirs(_CACHE, exist_ok=True)
    cache = os.path.join(_CACHE, f"synthetic_mnist_v2_{seed}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            return (z["xtr"], z["ytr"]), (z["xte"], z["yte"])
    glyphs = _render_glyphs()
    xtr, ytr = synthesize(TRAIN_N, seed, glyphs)
    xte, yte = synthesize(TEST_N, seed + 1, glyphs)
    np.savez_compressed(cache, xtr=xtr, ytr=ytr, xte=xte, yte=yte)
    return (xtr, ytr), (xte, yte)


# ------------------------------------------------------------------- public
def load_mnist(
    path: str | None = None,
    seed: int = 42,
    valid_fraction: float = 0.1,
    limit: int | None = None,
):
    """Returns ((x_train, y_train), (x_valid, y_valid), (x_test, y_test)),
    images NHWC float32 in [-1, 1].  `limit` truncates for tests."""
    data = None
    for candidate in (path, os.environ.get("CFGAN_DATA_DIR"), "/mnt/data",
                      os.path.join(_CACHE, "mnist")):
        if candidate and os.path.isdir(candidate):
            data = _load_real(candidate)
            if data is None:
                sub = os.path.join(candidate, "MNIST", "raw")
                if os.path.isdir(sub):
                    data = _load_real(sub)
            if data is not None:
                break
    if data is None:
        data = _load_synthetic(0)
    (xtr, ytr), (xte, yte) = data

    if limit is not None:
        xtr, ytr = xtr[: limit], ytr[: limit]
        xte, yte = xte[: max(limit // 5, 1)], yte[: max(limit // 5, 1)]

    def norm(x):
        fast = None
        if x.dtype == np.uint8:
            from cfgan import native

            fast = native.normalize_u8(x, 0.5, 0.5)  # C++ multithreaded path
        if fast is None:
            fast = ((x.astype(np.float32) / 255.0) - 0.5) / 0.5
        return fast.reshape(x.shape[0], 28, 28, 1)

    xtr = norm(xtr)
    xte = norm(xte)
    if valid_fraction > 0:
        idx_tr, idx_va = train_test_split(
            np.arange(len(ytr)),
            test_size=valid_fraction,
            stratify=ytr,
            random_state=seed,
        )
        return (
            (xtr[idx_tr], ytr[idx_tr].astype(np.int32)),
            (xtr[idx_va], ytr[idx_va].astype(np.int32)),
            (xte, yte.astype(np.int32)),
        )
    return (xtr, ytr.astype(np.int32)), (None, None), (xte, yte.astype(np.int32))
