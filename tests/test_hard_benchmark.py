"""Reduced hard-benchmark regression test (the full 20-class run is tracked
in the bench JSON on the TPU every round; this keeps a CPU-sized slice in
the suite so accuracy regressions fail fast)."""

import pytest

import hard_shapes


@pytest.mark.slow
def test_hard_benchmark_slice():
    acc, per_class = hard_shapes.run_hard_benchmark(
        seed=7, n_train=2, n_test=1, n=768, num_classes=6,
        keypoint_capacity=256)
    # 6 varied classes, rotated/noisy/partial/occluded test views
    assert acc >= 5 / 6, (acc, per_class)
