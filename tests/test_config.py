"""Config-tree tests: TabularSchema inference (from_dataframe)."""
import numpy as np
import pytest


def test_schema_from_dataframe_inference():
    import pandas as pd

    from cfgan.core.config import TabularSchema

    df = pd.DataFrame({
        "id": range(100),
        "price": np.linspace(1e5, 9e5, 100),
        "rooms": ([1, 2, 3, 4] * 25),
        "area": np.random.RandomState(0).uniform(30, 200, 100),
        "floor": ([0.0, 1.0] * 50),
        "age": np.random.RandomState(1).uniform(0, 90, 100).round(3),
    })
    sch = TabularSchema.from_dataframe(
        df, immutable=("age",), exclude=("id", "price"))
    assert sch.feature_names == ("rooms", "area", "floor", "age")
    assert set(sch.categorical_values) == {"rooms", "floor"}
    assert sch.categorical_values["rooms"] == (1.0, 2.0, 3.0, 4.0)
    assert sch.immutable_idx == (3,)
    # explicit overrides
    sch2 = TabularSchema.from_dataframe(
        df, exclude=("id", "price"),
        categorical={"rooms": (1.0, 2.0, 3.0, 4.0, 5.0)})
    assert sch2.categorical_values == {"rooms": (1.0, 2.0, 3.0, 4.0, 5.0)}
    sch3 = TabularSchema.from_dataframe(df, exclude=("id", "price"),
                                        categorical=())
    assert sch3.categorical_values == {}
    with pytest.raises(ValueError, match="not a column"):
        TabularSchema.from_dataframe(df, immutable=("nope",))


def test_schema_from_dataframe_recovers_kc_schema():
    """Inference on the real kc_house CSV reproduces the hand-maintained
    KC_SCHEMA's categorical split (reference `house config.py:55-79`) when
    given the same cardinality bound."""
    import os

    import pandas as pd

    from cfgan.core.config import TabularSchema
    from cfgan.data.kc_house import KC_SCHEMA

    csv = "/root/reference/conditional_counteRGAN/house_sales_kc_usa/kc_house_data.csv"
    if not os.path.exists(csv):
        pytest.skip("real CSV not available")
    df = pd.read_csv(csv).drop(columns=["id", "date", "zipcode"])
    df.loc[df["bedrooms"] > 8, "bedrooms"] = 8
    sch = TabularSchema.from_dataframe(
        df, immutable=KC_SCHEMA.immutable_features, exclude=("price",),
        max_categorical_cardinality=30)
    assert sch.feature_names == KC_SCHEMA.feature_names
    assert set(sch.categorical_values) == set(KC_SCHEMA.categorical_values)
    # observed value sets match the reference's hand-typed lists except
    # bedrooms, where the reference enumerates 0..8 but the data after its
    # own outlier clip contains no 0-bedroom... (check equality per column)
    for c, vals in sch.categorical_values.items():
        assert set(vals) <= set(KC_SCHEMA.categorical_values[c]), c
