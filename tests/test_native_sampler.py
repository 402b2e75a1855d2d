"""Native C++ pair sampler: build, correctness, determinism, speed."""
import time

import numpy as np
import pytest

from neuralsvd_tpu.data.native import NativePairSampler, gather_rows, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C++ toolchain available")


@pytest.fixture
def idx_maps(rng):
    classes = [f"c{i}" for i in range(12)]
    sk = {c: list(rng.choice(1000, size=rng.integers(3, 40), replace=False))
          for c in classes}
    ph = {c: list(rng.choice(2000, size=rng.integers(3, 60), replace=False))
          for c in classes}
    return classes, sk, ph


def test_pairs_are_class_consistent_and_balanced(idx_maps):
    classes, sk, ph = idx_maps
    s = NativePairSampler(sk, ph, classes, seed=1)
    B = 4 * len(classes)
    out_sk, out_ph, out_cls = s.sample(B, counter=0)
    for i in range(B):
        c = classes[out_cls[i]]
        assert out_sk[i] in sk[c]
        assert out_ph[i] in ph[c]
    # full cycles -> exactly balanced class counts
    counts = np.bincount(out_cls, minlength=len(classes))
    assert (counts == 4).all()


def test_deterministic_in_seed_and_counter(idx_maps):
    classes, sk, ph = idx_maps
    a = NativePairSampler(sk, ph, classes, seed=7).sample(64, counter=3)
    b = NativePairSampler(sk, ph, classes, seed=7).sample(64, counter=3)
    c = NativePairSampler(sk, ph, classes, seed=7).sample(64, counter=4)
    d = NativePairSampler(sk, ph, classes, seed=8).sample(64, counter=3)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any((x != y).any() for x, y in zip(a, c))
    assert any((x != y).any() for x, y in zip(a, d))


def test_draws_cover_members(idx_maps):
    """Every member of a class is eventually drawn (no off-by-one in the
    bounded draw)."""
    classes, sk, ph = idx_maps
    s = NativePairSampler(sk, ph, classes, seed=0)
    seen = set()
    for t in range(200):
        out_sk, _, out_cls = s.sample(128, counter=t)
        seen.update(zip(out_cls.tolist(), out_sk.tolist()))
    c0 = classes[0]
    drawn_c0 = {i for ci, i in seen if ci == 0}
    assert drawn_c0 == set(sk[c0])


def test_native_beats_python_loop(idx_maps):
    classes, sk, ph = idx_maps
    s = NativePairSampler(sk, ph, classes, seed=0)
    B, reps = 4096, 20
    s.sample(B, 0)
    t0 = time.perf_counter()
    for t in range(reps):
        s.sample(B, t)
    t_native = (time.perf_counter() - t0) / reps

    import random
    r = random.Random(0)

    def python_pick():
        cl = list(classes)
        r.shuffle(cl)
        out = []
        i = 0
        while len(out) < B:
            c = cl[i % len(cl)]
            i += 1
            out.append((r.choice(sk[c]), r.choice(ph[c])))
        return out

    python_pick()
    t0 = time.perf_counter()
    for _ in range(reps):
        python_pick()
    t_python = (time.perf_counter() - t0) / reps
    assert t_native < t_python / 5, (t_native, t_python)


def test_gather_rows_matches_numpy(rng):
    src = rng.normal(size=(500, 64)).astype(np.float32)
    idx = rng.integers(0, 500, size=200).astype(np.int32)
    np.testing.assert_array_equal(gather_rows(src, idx), src[idx])
