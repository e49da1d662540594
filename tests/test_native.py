"""Native C++ Dubins engine vs the pure-Python oracle."""

import numpy as np
import pytest

from aircraft_tpu.dubins.dubins2d import WORDS, shortest_path
from aircraft_tpu.native import native_available, sample_batch, shortest_batch

RNG = np.random.default_rng(11)


def random_batch(B):
    qis = np.column_stack(
        [RNG.uniform(-50, 50, B), RNG.uniform(-50, 50, B), RNG.uniform(0, 2 * np.pi, B)]
    )
    qfs = np.column_stack(
        [RNG.uniform(-50, 50, B), RNG.uniform(-50, 50, B), RNG.uniform(0, 2 * np.pi, B)]
    )
    rhos = RNG.uniform(1.0, 60.0, B)
    return qis, qfs, rhos


class TestNativeDubins:
    def test_matches_python_oracle(self):
        if not native_available():
            pytest.skip("no g++ toolchain")
        qis, qfs, rhos = random_batch(300)
        paths, ok = shortest_batch(qis, qfs, rhos)
        assert ok.all()
        for b in range(300):
            py = shortest_path(qis[b], qfs[b], float(rhos[b]))
            assert py is not None
            assert abs(paths[b, 4] - py.length) < 1e-6 * max(1.0, py.length), (
                b, WORDS[int(paths[b, 0])], py.word,
            )

    def test_sampled_endpoints(self):
        if not native_available():
            pytest.skip("no g++ toolchain")
        qis, qfs, rhos = random_batch(100)
        paths, ok = shortest_batch(qis, qfs, rhos)
        samples = sample_batch(qis, rhos, paths, 16)
        ends = samples[:, -1, :2]
        err = np.linalg.norm(ends - qfs[:, :2], axis=1)
        assert err[ok].max() < 1e-6 * 100

    def test_min_length(self):
        if not native_available():
            pytest.skip("no g++ toolchain")
        qis = np.array([[0.0, 0, 0]])
        qfs = np.array([[30.0, 0, 0]])
        rhos = np.array([3.0])
        paths, ok = shortest_batch(qis, qfs, rhos, min_lengths=np.array([50.0]))
        if ok[0]:
            assert paths[0, 4] >= 50.0 - 1e-9

    def test_throughput_exceeds_python(self):
        """The point of the native engine: beat Python on batches."""
        if not native_available():
            pytest.skip("no g++ toolchain")
        import time

        qis, qfs, rhos = random_batch(2000)
        t0 = time.time()
        shortest_batch(qis, qfs, rhos)
        native_t = time.time() - t0
        t0 = time.time()
        for b in range(200):  # sample of the batch, scaled
            shortest_path(qis[b], qfs[b], float(rhos[b]))
        python_t = (time.time() - t0) * 10
        assert native_t < python_t, (native_t, python_t)
