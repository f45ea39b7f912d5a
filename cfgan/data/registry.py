"""Dataset registry keyed by DataConfig.name."""
from __future__ import annotations

from cfgan.core.config import DataConfig


def load_dataset(cfg: DataConfig, limit: int | None = None):
    """Returns a dict with keys depending on the dataset family:

    moons:    train=(x,y) test=(x,y) stats num_classes
    mnist:    train valid test (NHWC [-1,1]) num_classes
    kc_house: train test stats bins schema num_classes
    """
    if cfg.name == "moons":
        from cfgan.data.moons import load_moons3

        (xtr, ytr), (xte, yte), stats = load_moons3(
            seed=cfg.seed, test_fraction=cfg.test_fraction
        )
        if limit:
            xtr, ytr = xtr[:limit], ytr[:limit]
        return {
            "train": (xtr, ytr),
            "test": (xte, yte),
            "stats": stats,
            "num_classes": 3,
        }
    if cfg.name == "moons2":
        from cfgan.data.moons import load_moons2

        x, y = load_moons2(seed=cfg.seed)
        if limit:
            x, y = x[:limit], y[:limit]
        return {"train": (x, y), "num_classes": 2}
    if cfg.name == "mnist":
        from cfgan.data.mnist import load_mnist

        train, valid, test = load_mnist(
            path=cfg.path,
            seed=cfg.seed,
            valid_fraction=cfg.valid_fraction,
            limit=limit,
        )
        return {"train": train, "valid": valid, "test": test, "num_classes": 10}
    if cfg.name == "kc_house":
        from cfgan.data.kc_house import load_kc_house

        train, test, stats, bins, schema = load_kc_house(
            path=cfg.path, seed=cfg.seed, test_fraction=cfg.test_fraction
        )
        if limit:
            train = (train[0][:limit], train[1][:limit])
        return {
            "train": train,
            "test": test,
            "stats": stats,
            "bins": bins,
            "schema": schema,
            "num_classes": 4,
        }
    raise KeyError(f"unknown dataset {cfg.name!r}")
