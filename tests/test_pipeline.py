"""Tests for the threaded dataflow pipeline (moge_tpu.utils.pipeline).

The reference depends on an external `pipeline` package for its data
loaders; ours is a rebuild. The critical property is that Parallel is
order-preserving — the train loader batches consecutive items that share a
sampled image size, so reordering would produce ragged batches.
"""

import time

import pytest

from moge_tpu.utils.pipeline import Batch, Buffer, Parallel, Sequential, Unbatch, Worker


def _source_fn(n):
    def gen():
        for i in range(n):
            yield i

    return gen


def test_sequential_end_to_end():
    with Sequential([_source_fn(10), lambda x: x * 2]) as pipe:
        out = list(pipe)
    assert out == [i * 2 for i in range(10)]


def test_parallel_preserves_order_under_skewed_latency():
    # Early items sleep longest: an unordered pool would emit them last.
    def slow(x):
        time.sleep(0.02 * (10 - x))
        return x

    with Sequential([_source_fn(10), Parallel([slow] * 4)]) as pipe:
        out = list(pipe)
    assert out == list(range(10))


def test_batch_unbatch_roundtrip():
    with Sequential([_source_fn(10), Batch(4)]) as pipe:
        batches = list(pipe)
    assert batches == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]  # trailing partial batch kept

    with Sequential([_source_fn(10), Batch(4), Unbatch()]) as pipe:
        out = list(pipe)
    assert out == list(range(10))


def test_worker_exception_yields_none_and_continues():
    def flaky(x):
        if x == 3:
            raise ValueError("boom")
        return x

    with Sequential([_source_fn(6), Worker(flaky)]) as pipe:
        out = list(pipe)
    assert out == [0, 1, 2, None, 4, 5]


def test_buffer_passthrough_and_early_stop():
    pipe = Sequential([_source_fn(1000), Buffer(16), lambda x: x + 1])
    pipe.start()
    got = [pipe.get(timeout=5) for _ in range(5)]
    pipe.stop()  # must not hang with a long source still pending
    assert got == [1, 2, 3, 4, 5]


def test_get_timeout_and_stopiteration():
    with Sequential([_source_fn(2)]) as pipe:
        assert pipe.get(timeout=5) == 0
        assert pipe.get(timeout=5) == 1
        with pytest.raises(StopIteration):
            pipe.get(timeout=5)
        with pytest.raises(StopIteration):
            pipe.get(timeout=5)  # stays ended
