"""Typed JSON field extraction (stages/scalar.py:extract_json_fields)."""

import pyarrow as pa
import pytest
import ray

from featurebox_ray.stages.scalar import extract_json_fields


def test_extract_json_fields_types_and_nulls():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "props": pa.array(['{"k": 69, "s": "abc", "f": -1.25}',
                           '{"k": -3}', '{"s": ""}', "null", None]),
    })
    got = extract_json_fields(
        ray.data.from_arrow(t).repartition(2), json_col="props",
        fields={"k": ("k", "int"), "f": ("f", "float"),
                "s": ("s", "str")}).to_pandas().sort_values("id")
    assert got["k"].tolist()[:2] == [69, -3]
    assert got["k"].isna().tolist() == [False, False, True, True, True]
    assert got["f"].tolist()[0] == -1.25 and got["f"].isna().sum() == 4
    assert got["s"].tolist()[0] == "abc" and got["s"].tolist()[2] == ""
    with pytest.raises(ValueError, match="unsupported type"):
        extract_json_fields(ray.data.from_arrow(t), json_col="props",
                            fields={"x": ("k", "bool")})


def test_extract_json_int_fractional_yields_null_not_crash():
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "props": pa.array(['{"k": 1.25}', '{"k": 7}', '{"k": -0}']),
    })
    got = (extract_json_fields(ray.data.from_arrow(t),
                               json_col="props",
                               fields={"k": ("k", "int")})
           .to_pandas().sort_values("id"))
    assert got["k"].isna().tolist() == [True, False, False]
    assert got["k"].tolist()[1] == 7 and got["k"].tolist()[2] == 0
