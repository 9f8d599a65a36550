"""Async input pipeline tests."""

import time

import numpy as np

from mmdti_tpu.data.pipeline import AsyncLoader, device_prefetch, prefetch_to_device


class SlowLoader:
    def __init__(self, n, delay=0.01):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            time.sleep(self.delay)
            yield i


class TestAsyncLoader:
    def test_order_and_completeness(self):
        out = list(AsyncLoader(SlowLoader(10, 0.001)))
        assert out == list(range(10))

    def test_exception_propagates(self):
        class Bad:
            def __iter__(self):
                yield 1
                raise RuntimeError("boom")

        import pytest

        with pytest.raises(RuntimeError, match="boom"):
            list(AsyncLoader(Bad()))

    def test_abandoned_consumer_stops_worker(self):
        """A consumer that abandons the generator mid-iteration (e.g. an
        exception in the train loop) must not leave the worker thread blocked
        on the bounded queue forever."""
        consumed = [0]

        class Counting:
            def __iter__(self):
                for i in range(10_000):
                    consumed[0] = i
                    yield i

        gen = iter(AsyncLoader(Counting(), depth=2))
        assert next(gen) == 0
        gen.close()  # abandon: fires the generator's finally -> stop event
        time.sleep(0.5)
        seen = consumed[0]
        time.sleep(0.5)
        assert consumed[0] == seen  # worker stopped pulling from the loader
        assert consumed[0] < 100   # and it stopped early, not after draining

    def test_overlap_speedup(self):
        # consumer that also sleeps: total should approach max(prod, cons)
        delay = 0.005
        n = 20
        t0 = time.perf_counter()
        for _ in AsyncLoader(SlowLoader(n, delay), depth=4):
            time.sleep(delay)
        overlapped = time.perf_counter() - t0
        assert overlapped < 2 * n * delay * 0.9  # clearly better than serial


class TestDevicePrefetch:
    def test_put_applied_and_order(self):
        calls = []

        def put(x):
            calls.append(x)
            return x * 10

        out = list(device_prefetch(range(5), put, depth=2))
        assert out == [0, 10, 20, 30, 40]
        assert calls == list(range(5))

    def test_prefetch_ahead(self):
        seen = []

        def put(x):
            seen.append(x)
            return x

        gen = device_prefetch(range(6), put, depth=3)
        next(gen)
        # after consuming 1, at least depth+1 items were already put
        assert len(seen) >= 4

    def test_short_iterables(self):
        assert list(device_prefetch([1], lambda x: x, depth=4)) == [1]
        assert list(device_prefetch([], lambda x: x, depth=2)) == []

    def test_composed(self):
        out = list(prefetch_to_device(SlowLoader(5, 0.001), lambda x: -x))
        assert out == [0, -1, -2, -3, -4]
