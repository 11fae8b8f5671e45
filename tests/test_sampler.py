"""ContiguousDistributedSampler: scene-granularity shuffle semantics
(reference datasets/sampler.py:56-76; trains with shuffle=False —
scene-level permutation is the only order freedom GRU fusion admits)."""
import numpy as np
import pytest

from eprecon_tpu.data.sampler import (ContiguousDistributedSampler,
                                      contiguous_shards, scene_runs)


def test_scene_runs():
    assert scene_runs(["a", "a", "b", "c", "c", "c"]) == [
        range(0, 2), range(2, 3), range(3, 6)]
    assert scene_runs([]) == []


def _fragments(n_scenes=6, per_scene=4):
    return [f"s{i}" for i in range(n_scenes) for _ in range(per_scene)]


def test_no_shuffle_is_contiguous_identity():
    ids = _fragments()
    s = ContiguousDistributedSampler(len(ids), 2, 1)
    assert list(s) == list(contiguous_shards(len(ids), 2)[1])


def test_shuffle_permutes_scenes_keeps_fragment_order():
    ids = _fragments()
    s = ContiguousDistributedSampler(len(ids), 1, 0, shuffle=True,
                                     seed=7, scene_ids=ids)
    s.set_epoch(3)
    order = list(s)
    assert sorted(order) == list(range(len(ids)))
    assert order != list(range(len(ids)))  # epoch-3 permutation is nontrivial
    # within each scene, fragments stay in temporal order
    runs = scene_runs([ids[i] for i in order])
    for r in runs:
        chunk = order[r.start:r.stop]
        assert chunk == list(range(chunk[0], chunk[0] + len(chunk)))


def test_shuffle_is_epoch_deterministic_and_epoch_varying():
    ids = _fragments()
    a = ContiguousDistributedSampler(len(ids), 1, 0, shuffle=True,
                                     seed=7, scene_ids=ids)
    b = ContiguousDistributedSampler(len(ids), 1, 0, shuffle=True,
                                     seed=7, scene_ids=ids)
    a.set_epoch(1), b.set_epoch(1)
    assert list(a) == list(b)
    b.set_epoch(2)
    assert list(a) != list(b)


def test_shuffle_shards_partition_the_permutation():
    ids = _fragments(n_scenes=8, per_scene=3)
    shards = []
    for d in range(4):
        s = ContiguousDistributedSampler(len(ids), 4, d, shuffle=True,
                                         seed=0, scene_ids=ids)
        s.set_epoch(5)
        shards.append(list(s))
    flat = [i for sh in shards for i in sh]
    assert sorted(flat) == list(range(len(ids)))
    assert all(len(sh) == len(ids) // 4 for sh in shards)


def test_shuffle_requires_scene_ids():
    with pytest.raises(ValueError):
        ContiguousDistributedSampler(10, 1, 0, shuffle=True)
    with pytest.raises(ValueError):
        ContiguousDistributedSampler(10, 1, 0, scene_ids=["a"] * 9)
