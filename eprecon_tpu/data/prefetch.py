"""Decode-ahead fragment prefetching over the native loader.

Reference: main.py:130-151 uses 8 DataLoader worker processes to overlap
jpg/png decode with GPU compute. Here the overlap comes from the threaded
C++ loader (runtime/fragment_loader.cpp): fragment N+depth's images are
decoding while fragment N is on the TPU, and the host only assembles the
cheap numpy parts (poses, intrinsics, GT windows) synchronously.
"""
from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Optional, Sequence, Tuple

from eprecon_tpu.data.native_loader import NativeFragmentLoader


class FragmentPrefetcher:
    """Iterate dataset samples with images decoded `depth` fragments ahead.

    Yields exactly what `dataset[i]` would, but with the jpg/png decode and
    resize running in native threads. Falls back transparently to the
    python decoder when the shared library is unavailable (still correct,
    no overlap).
    """

    def __init__(self, dataset, n_threads: int = 8,
                 out_size: Tuple[int, int] = (640, 480),
                 depth: int = 2, max_depth: float = 3.0):
        self.dataset = dataset
        self.depth = max(depth, 1)
        self.loader = NativeFragmentLoader(n_threads, out_size, max_depth)

    @property
    def native(self) -> bool:
        return self.loader.native

    def close(self):
        self.loader.close()

    def iterate(self, indices: Sequence[int]) -> Iterator[dict]:
        idxs = list(indices)
        tickets: deque = deque()

        def submit(j):
            imgs, depths = self.dataset.image_paths(idxs[j])
            tickets.append((idxs[j], len(imgs),
                            self.loader.submit(imgs, depths)))

        for j in range(min(self.depth, len(idxs))):
            submit(j)
        for i in range(len(idxs)):
            idx, n_views, ticket = tickets.popleft()
            if i + self.depth < len(idxs):
                submit(i + self.depth)
            imgs, depths = self.loader.fetch(ticket, n_views)
            yield self.dataset.getitem_decoded(idx, imgs, depths)
