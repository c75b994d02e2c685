"""Helper-law tests (mirrors the reference's test_helpers.py)."""

import pytest
from pyspark.sql import functions as F

from composable_logs_spark.functions.helpers import (
    compose,
    del_key,
    dict_prefix_keys,
    flatten,
    map_del_key_col,
    map_prefix_keys_col,
    one,
    pairs,
    range_intersect,
    range_intersection,
    range_is_empty,
)


def test_ranges():
    assert range_intersection((0, 10), (5, 15)) == (5, 10)
    assert range_intersection((0, 5), (5, 10)) is None  # half-open: no touch
    assert range_intersect((0, 10), (9, 11))
    assert not range_intersect((0, 1), (2, 3))
    assert range_is_empty(None)
    assert not range_is_empty((0, 1))


def test_list_helpers():
    assert flatten([[1, 2], [3], []]) == [1, 2, 3]
    assert pairs([1, 2, 3]) == [(1, 2), (2, 3)]
    assert pairs([1]) == []


def test_dict_helpers():
    d = {"a": 1, "b": 2}
    assert dict_prefix_keys("task.", d) == {"task.a": 1, "task.b": 2}
    assert del_key(d, "a") == {"b": 2}
    assert del_key(d, "zz") == d
    assert d == {"a": 1, "b": 2}  # originals untouched


def test_compose_and_one():
    assert compose(lambda x: x + 1, lambda x: x * 2)(3) == 7  # f(g(x))
    assert one([42]) == 42
    with pytest.raises(ValueError):
        one([1, 2])
    with pytest.raises(ValueError):
        one([])


def test_map_column_helpers(spark):
    df = spark.createDataFrame([({"a": "1", "b": "2"},)], "m map<string,string>")
    out = df.select(
        map_prefix_keys_col(F.col("m"), "task.").alias("p"),
        map_del_key_col(F.col("m"), "a").alias("d"),
    ).collect()[0]
    assert out["p"] == {"task.a": "1", "task.b": "2"}
    assert out["d"] == {"b": "2"}
