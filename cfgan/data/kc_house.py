"""King County house-sales tabular dataset.

Behavioral equivalent of `house_sales_kc_usa/data_utils.py:5-41`: drop
id/date/zipcode, clip the 33-bedroom outlier to 8, quartile price classes via
qcut (bin edges kept as metadata), 80/20 split, MinMax scaling fit on train.

The CSV is resolved from (in order): explicit path, $CFGAN_KC_HOUSE_CSV, the
read-only reference checkout, a cached copy.  When none exists (offline CI),
a schema-faithful synthetic table is generated so the pipeline stays
runnable and testable.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from cfgan.core.config import TabularSchema
from cfgan.data.transforms import NormStats, fit_minmax

KC_SCHEMA = TabularSchema(
    feature_names=(
        "bedrooms", "bathrooms", "sqft_living", "sqft_lot",
        "floors", "waterfront", "view", "condition", "grade",
        "sqft_above", "sqft_basement", "yr_built", "yr_renovated",
        "lat", "long", "sqft_living15", "sqft_lot15",
    ),
    immutable_features=("lat", "long", "yr_built", "yr_renovated"),
    categorical_values={
        "bedrooms": tuple(float(v) for v in range(9)),
        "bathrooms": tuple(sorted([
            0.00, 0.50, 0.75, 1.00, 1.25, 1.50, 1.75, 2.00, 2.25, 2.50,
            2.75, 3.00, 3.25, 3.50, 3.75, 4.00, 4.25, 4.50, 4.75, 5.00,
            5.25, 5.50, 5.75, 6.00, 6.25, 6.50, 6.75, 7.50, 7.75, 8.00,
        ])),
        "floors": (1.0, 1.5, 2.0, 2.5, 3.0, 3.5),
        "waterfront": (0.0, 1.0),
        "view": (0.0, 1.0, 2.0, 3.0, 4.0),
        "condition": (1.0, 2.0, 3.0, 4.0, 5.0),
        "grade": tuple(float(v) for v in range(1, 14)),
    },
)

_DEFAULT_PATHS = (
    "kc_house_data.csv",
    "/root/reference/conditional_counteRGAN/house_sales_kc_usa/kc_house_data.csv",
    os.path.expanduser("~/.cache/cfgan/kc_house_data.csv"),
)


def _resolve_csv(path: str | None) -> str | None:
    candidates = [path, os.environ.get("CFGAN_KC_HOUSE_CSV"), *_DEFAULT_PATHS]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _synthesize(n: int = 21613, seed: int = 0) -> pd.DataFrame:
    """Schema-faithful synthetic fallback with a learnable price signal."""
    rng = np.random.RandomState(seed)
    sch = KC_SCHEMA
    df = pd.DataFrame()
    df["bedrooms"] = rng.choice(range(9), n, p=_geo(9, 3))
    df["bathrooms"] = rng.choice(sch.categorical_values["bathrooms"], n)
    df["sqft_living"] = np.exp(rng.normal(7.55, 0.42, n)).round().clip(290, 13540)
    df["sqft_lot"] = np.exp(rng.normal(8.99, 0.9, n)).round().clip(520, 1651359)
    df["floors"] = rng.choice(sch.categorical_values["floors"], n)
    df["waterfront"] = (rng.uniform(0, 1, n) < 0.0075).astype(float)
    df["view"] = rng.choice(range(5), n, p=_geo(5, 0.35))
    df["condition"] = rng.choice(range(1, 6), n, p=[0.01, 0.01, 0.65, 0.26, 0.07])
    df["grade"] = np.clip(rng.normal(7.65, 1.17, n).round(), 1, 13)
    df["sqft_above"] = (df["sqft_living"] * rng.uniform(0.6, 1.0, n)).round()
    df["sqft_basement"] = df["sqft_living"] - df["sqft_above"]
    df["yr_built"] = rng.randint(1900, 2016, n)
    df["yr_renovated"] = np.where(rng.uniform(0, 1, n) < 0.04,
                                  rng.randint(1950, 2016, n), 0)
    df["lat"] = rng.uniform(47.156, 47.778, n)
    df["long"] = rng.uniform(-122.52, -121.31, n)
    df["sqft_living15"] = (df["sqft_living"] * rng.uniform(0.7, 1.3, n)).round()
    df["sqft_lot15"] = (df["sqft_lot"] * rng.uniform(0.7, 1.3, n)).round()
    log_price = (
        9.0
        + 0.00035 * df["sqft_living"]
        + 0.11 * df["grade"]
        + 0.9 * df["waterfront"]
        + 0.06 * df["view"]
        + 0.04 * df["condition"]
        + 1.1 * (df["lat"] - 47.15)
        + rng.normal(0, 0.25, n)
    )
    df["price"] = np.exp(log_price.clip(10.5, 14.8))
    return df


def _geo(n, mean):
    p = np.exp(-0.5 * ((np.arange(n) - mean) / 1.2) ** 2)
    return p / p.sum()


def load_kc_house(path: str | None = None, seed: int = 42, test_fraction: float = 0.2):
    """Returns ((x_train, y_train), (x_test, y_test), stats, bins, schema)."""
    csv = _resolve_csv(path)
    if csv is not None:
        df = pd.read_csv(csv)
        df = df.drop(columns=["id", "date", "zipcode"])
    else:
        df = _synthesize()
    df = df.copy()
    df.loc[df["bedrooms"] > 8, "bedrooms"] = 8

    price_class, bins = pd.qcut(
        df["price"], q=4, labels=[0, 1, 2, 3], retbins=True, duplicates="drop"
    )
    y = price_class.astype(int).values

    x = df[list(KC_SCHEMA.feature_names)].astype(np.float64).values
    x_train, x_test, y_train, y_test = train_test_split(
        x, y, test_size=test_fraction, random_state=seed
    )
    stats = fit_minmax(x_train)
    x_train = np.asarray(stats.transform(x_train), np.float32)
    x_test = np.asarray(stats.transform(x_test), np.float32)
    return (
        (x_train, y_train.astype(np.int32)),
        (x_test, y_test.astype(np.int32)),
        stats,
        np.asarray(bins, np.float64),
        KC_SCHEMA,
    )
