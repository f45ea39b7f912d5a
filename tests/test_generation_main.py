"""Generation experiment main: end-to-end tiny run writes the artifact set;
GIF assembly works with in-memory frames."""
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_simple_gan_moons_main(tmp_path):
    from cfgan.experiments.generation import run

    state, hist = run("simple_gan_moons", epochs=3, limit=200,
                      out_dir=str(tmp_path))
    assert np.isfinite(hist["g_loss"][-1])
    for f in ("loss.png", "generated.png"):
        assert os.path.exists(tmp_path / f), f
    assert os.path.exists(tmp_path / "generator" / "checkpoint.msgpack")


def test_make_gif_fixed_fps(tmp_path):
    from cfgan.eval.samples import make_gif, to_uint8_grid

    rng = np.random.RandomState(0)
    frames = [to_uint8_grid(rng.uniform(-1, 1, (4, 8, 8, 1)), nrow=2)
              for _ in range(3)]
    p = make_gif(frames, str(tmp_path / "anim.gif"), fps=5)
    assert os.path.getsize(p) > 0


def test_image_grid_layout():
    from cfgan.eval.samples import to_uint8_grid

    imgs = np.full((6, 4, 4, 1), -1.0, np.float32)
    imgs[0] = 1.0  # first cell white
    grid = to_uint8_grid(imgs, nrow=3, pad=1)
    # 2 rows x 3 cols of 4x4 cells with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1)
    assert grid[1, 1] == 255 and grid[1, 6] == 0


def test_countergan2_cli_requires_target():
    """countergan2.py:17 makes --target required; the rebuilt CLI must too."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "cfgan.experiments.mnist_countergan2"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 2
    assert "--target" in proc.stderr

    proc = subprocess.run(
        [sys.executable, "-m", "cfgan.experiments.mnist_countergan2",
         "--target", "12"],
        capture_output=True, text=True,
    )
    assert proc.returncode == 2
    assert "0..9" in proc.stderr
