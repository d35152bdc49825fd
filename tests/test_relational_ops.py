"""Unit tests for the engine's relational primitives beyond the SQL
oracle: hash_join edge cases (the oracle only sees the happy path)."""

import pandas as pd
import pyarrow as pa
import pytest


def _ds(ray_session, table: pa.Table, nblocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(nblocks)


@pytest.fixture(scope="module")
def sides(ray_session):
    left = pa.table({
        "l_key": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
        "l_val": pa.array(["a", "b", "c", "d", "e"]),
    })
    right = pa.table({
        "r_key": pa.array([2, 3, 3, 4], type=pa.int64()),
        "r_val": pa.array([20, 30, 31, 40], type=pa.int64()),
    })
    return left, right


def test_hash_join_inner_semantics(ray_session, sides):
    from pdf4py_ray.stages.relational import hash_join

    left, right = sides
    out = hash_join(
        _ds(ray_session, left), _ds(ray_session, right),
        "l_key", "r_key", left.schema, right.schema, num_buckets=4,
    ).to_pandas()
    got = sorted(map(tuple, out[["l_key", "l_val", "r_val"]].itertuples(index=False)))
    # duplicate keys on both sides produce the full cross product per key
    expected = sorted([
        (2, "b", 20), (2, "c", 20),
        (3, "d", 30), (3, "d", 31),
    ])
    assert got == expected
    # dtypes survive the typed-null padding
    assert out["r_val"].dtype == "int64" and out["l_key"].dtype == "int64"


def test_hash_join_empty_side(ray_session, sides):
    from pdf4py_ray.stages.relational import hash_join

    left, _ = sides
    empty_right = pa.table({
        "r_key": pa.array([], type=pa.int64()),
        "r_val": pa.array([], type=pa.int64()),
    })
    out = hash_join(
        _ds(ray_session, left), _ds(ray_session, empty_right, 1),
        "l_key", "r_key", left.schema, empty_right.schema, num_buckets=4,
    ).to_pandas()
    assert len(out) == 0


def test_hash_join_rejects_shared_names(ray_session, sides):
    from pdf4py_ray.stages.relational import hash_join

    left, _ = sides
    with pytest.raises(AssertionError):
        hash_join(
            _ds(ray_session, left), _ds(ray_session, left),
            "l_key", "l_key", left.schema, left.schema,
        )
