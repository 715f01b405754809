"""Reduced hard-benchmark regression test (the full 20-class run is tracked
in the bench JSON on the TPU every round; this keeps a CPU-sized slice in
the suite so accuracy regressions fail fast)."""

import pytest

import hard_shapes


@pytest.mark.slow
def test_hard_benchmark_slice():
    acc, per_class = hard_shapes.run_hard_benchmark(
        seed=7, n_train=2, n_test=2, n=768, num_classes=6,
        keypoint_capacity=256)
    # 6 varied classes x 2 rotated/noisy/partial/occluded test views each;
    # currently 12/12 — the gate allows one borderline flip, a drop of two
    # is a real regression
    assert acc >= 11 / 12, (acc, per_class)
