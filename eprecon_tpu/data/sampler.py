"""Contiguous-block data sharding for fragment streams.

Reference: datasets/sampler.py:56-76 — rank r gets the contiguous slice
[r*n, (r+1)*n) instead of a strided split, preserving the temporal order of
a scene's fragments within a rank, which the GRU fusion's stateful global
volume requires. Here a "rank" is a (process, local device) pair: each
device of the data mesh carries its own scene stream + RecurrentState.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence


def contiguous_shards(n_items: int, n_shards: int) -> List[range]:
    """Split [0, n_items) into n_shards contiguous blocks (last may be short;
    the reference pads by repeating — we truncate to the shortest so all
    shards step in lockstep for SPMD)."""
    per = n_items // n_shards
    return [range(s * per, (s + 1) * per) for s in range(n_shards)]


class ContiguousDistributedSampler:
    """Iterate contiguous per-shard index blocks, optionally epoch-shuffled
    at the *scene granularity* only (fragments within a scene stay ordered).
    """

    def __init__(self, n_items: int, n_shards: int, shard: int,
                 shuffle: bool = False, seed: int = 0):
        self.n_items = n_items
        self.n_shards = n_shards
        self.shard = shard
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        block = contiguous_shards(self.n_items, self.n_shards)[self.shard]
        return iter(block)

    def __len__(self) -> int:
        return self.n_items // self.n_shards
