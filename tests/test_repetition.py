"""Gopher repetition stats + decontamination (pipelines/repetition.py).

Hand-computed fixtures: a doc with a planted repeated 2-gram, a doc of
all-distinct words, and a train doc sharing a planted 4-gram with the
test split.
"""
import numpy as np
import pyarrow as pa
import pytest

import ray

from lib_gdal_ray.pipelines.repetition import (
    _gram_hashes, _per_doc_run_stats, _token_hashes,
    decontaminate, repetition_stats)


def _mk_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_token_hashes_counts_and_distinctness():
    h1, h2, counts = _token_hashes(["a b c", "aa bb", "a"])
    assert counts.tolist() == [3, 2, 1]
    # same word hashes equal, different words differ
    assert h1[0] == h1[5] and h2[0] == h2[5]
    assert len({(int(a), int(b)) for a, b in zip(h1[:5], h2[:5])}) == 5


def test_gram_hash_boundary_no_concat_ambiguity():
    # ("ab","c") must differ from ("a","bc")
    h1, h2, c = _token_hashes(["ab c", "a bc"])
    g, gc = _gram_hashes(h1, h2, c, 2)
    assert gc.tolist() == [1, 1]
    assert g[0] != g[1]


def test_per_doc_run_stats_hand_computed():
    # doc0 grams: x y x x y  -> top=3 (x), dup=5 (both x:3 and y:2 repeat)
    # doc1 grams: p q        -> top=1, dup=0
    gram = np.array([7, 9, 7, 7, 9, 3, 4], dtype=np.uint64)
    counts = np.array([5, 2], dtype=np.int64)
    top, dup = _per_doc_run_stats(gram, counts)
    assert top.tolist() == [3, 1]
    assert dup.tolist() == [5, 0]


def test_repetition_stats_planted(ray_session):
    rows = [
        (1, "spam eggs spam eggs spam eggs spam eggs"),  # heavy 2-gram rep
        (2, "one two three four five six seven eight"),  # all distinct
    ]
    out = repetition_stats(_mk_ds(rows)).to_pandas().set_index("doc_id")
    # doc1: 8 tokens, 7 2-grams: "spam eggs" x4, "eggs spam" x3
    assert out.loc[1, "n_tok"] == 8
    assert out.loc[1, "n2"] == 7
    assert out.loc[1, "top2_cnt"] == 4
    assert out.loc[1, "dup5_cnt"] == 4  # 4 5-grams, 2 distinct, both dup
    assert out.loc[1, "keep"] == 0
    assert out.loc[2, "top2_cnt"] == 1
    assert out.loc[2, "dup5_cnt"] == 0
    assert out.loc[2, "keep"] == 1


def test_decontaminate_planted(ray_session):
    test = _mk_ds([(100, "alpha beta gamma delta epsilon")])
    train = _mk_ds([
        # shares the 4-gram "beta gamma delta epsilon"
        (1, "x y beta gamma delta epsilon z"),
        # shares only a 3-gram -> clean at n=4
        (2, "beta gamma delta nope nope2 nope3"),
        # too short for any 4-gram
        (3, "just three words"),
    ])
    out = decontaminate(train, test, n=4).to_pandas().set_index("doc_id")
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hit"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "contaminated"] == 0 and out.loc[3, "n_hit"] == 0
    assert len(out) == 3
