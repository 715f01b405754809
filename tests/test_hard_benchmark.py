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


@pytest.mark.slow
def test_instance_benchmark_slice():
    """CPU-sized slice of the instance-label benchmark (the full set runs
    in the bench JSON): both InstanceLabelsPrimary modes produce class
    accuracy at least as good as instance accuracy, class accuracy stays
    high on this easy slice, and every field is populated."""
    out = hard_shapes.run_instance_benchmark(
        num_classes=3, num_variants=2, n_train_views=2, n_test_views=2,
        n=768, keypoint_capacity=128)
    assert out["n_test_views"] == 12
    for k in ("class_primary_class_acc", "class_primary_instance_acc",
              "instance_primary_class_acc", "instance_primary_instance_acc"):
        assert 0.0 <= out[k] <= 1.0
    # classes are easier than instances by construction
    assert out["class_primary_class_acc"] >= out["class_primary_instance_acc"]
    assert out["instance_primary_class_acc"] >= \
        out["instance_primary_instance_acc"]
    assert out["class_primary_class_acc"] >= 10 / 12
    assert out["instance_primary_class_acc"] >= 10 / 12
