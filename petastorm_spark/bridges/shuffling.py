"""RandomShufflingBuffer: bounded uniform-sampling shuffle for item
streams (parity: petastorm/reader_impl/shuffling_buffer.py:103-180 D6
and the batched torch variant D7).

Used between a Reader and a training loop to decorrelate row order
beyond row-group granularity: items fill the buffer to ``capacity``
before any retrieval; each retrieval removes a uniformly random
element (one-in/one-out steady state at capacity); on finish the
buffer drains in random order. ``min_after_dequeue`` is kept for
reference API parity and validated, but has no effect in this
single-threaded generator form (retrieval never races the producer).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np


class RandomShufflingBuffer:
    def __init__(
        self,
        capacity: int,
        min_after_dequeue: int,
        seed: int | None = None,
        rng: np.random.Generator | None = None,
    ):
        if min_after_dequeue >= capacity:
            raise ValueError("min_after_dequeue must be < capacity")
        self._capacity = capacity
        self._min = min_after_dequeue
        self._rng = rng if rng is not None else np.random.default_rng(seed)
        self._items: list = []

    def shuffle(self, source: Iterable) -> Iterator:
        """Stream items through the buffer, yielding a shuffled stream
        with the same multiset. The buffer FILLS to capacity before the
        first retrieval (petastorm semantics: shuffle window ==
        capacity, not min_after_dequeue), then runs one-in/one-out, and
        drains fully at end-of-stream."""
        for item in source:
            self._items.append(item)
            if len(self._items) >= self._capacity:
                yield self._pop_random()
        while self._items:
            yield self._pop_random()

    def _pop_random(self):
        i = int(self._rng.integers(0, len(self._items)))
        self._items[i], self._items[-1] = self._items[-1], self._items[i]
        return self._items.pop()


class NoopShufflingBuffer:
    """Pass-through variant (petastorm parity for shuffling off)."""

    def __init__(self, *args, **kwargs):
        pass

    @staticmethod
    def shuffle(source: Iterable) -> Iterator:
        yield from source
