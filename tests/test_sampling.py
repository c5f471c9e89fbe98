"""hash_sample / per_group_quota (pipelines/sampling.py)."""
import numpy as np
import pyarrow as pa
import pytest

import ray

from lib_gdal_ray.pipelines.sampling import (
    _HASH_A, _HASH_M, hash_sample, per_group_quota)


def _docs(n=200, n_groups=5):
    ids = np.arange(n, dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "grp": pa.array([f"g{int(i) % n_groups}" for i in ids]),
    }))


def test_hash_sample_matches_reference_set(ray_session):
    out = hash_sample(_docs(), "doc_id", 40).to_pandas()
    ids = np.arange(200, dtype=np.uint64)
    expect = ids[((ids * _HASH_A) % _HASH_M) % np.uint64(100) < 40]
    assert sorted(out["doc_id"]) == sorted(int(i) for i in expect)
    # deterministic: second run identical
    out2 = hash_sample(_docs(), "doc_id", 40).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_hash_sample_edges(ray_session):
    assert hash_sample(_docs(50), "doc_id", 100).count() == 50
    assert hash_sample(_docs(50), "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        hash_sample(_docs(10), "doc_id", 101)


def test_per_group_quota_takes_k_smallest(ray_session):
    out = per_group_quota(_docs(200, 4), "grp", "doc_id", 7).to_pandas()
    assert len(out) == 28
    for g, sub in out.groupby("grp"):
        gi = int(g[1:])
        # k smallest doc_ids in the group are gi, gi+4, ..., gi+24
        assert sorted(sub["doc_id"]) == [gi + 4 * j for j in range(7)]


def test_per_group_quota_small_groups_untouched(ray_session):
    out = per_group_quota(_docs(6, 6), "grp", "doc_id", 3).to_pandas()
    assert len(out) == 6  # every group smaller than k survives whole
