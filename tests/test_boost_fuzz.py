"""Adversarial robustness tests for the boost `.ismd` codec
(utils/boost_archive.py): truncated streams, wrong version stamps,
corrupt/oversized counts and random garbage must all raise a clean typed
ValueError quickly -- never hang, never return garbage, never leak
struct.error (VERDICT r4 next #7).

Cross-validation against bytes from a real boost build remains
environment-blocked (no boost headers in the image); these tests pin the
failure-mode contract instead."""

import struct

import numpy as np
import pytest

from point_cloud_donkey_tpu.utils import boost_archive as ba


@pytest.fixture(scope="module")
def archive_bytes(tmp_path_factory):
    """A small real archive written by the codec itself."""
    data = ba.RefIsmData()
    data.instance_to_class = {0: 0, 1: 0, 2: 1}
    e = ba.RefCodewordEntry(
        cw_id=0, num_features=2, cw_weight=0.5,
        descriptor=np.linspace(0, 1, 352).astype(np.float32),
        cw_class_id=1,
        keypoint=np.array([0.1, 0.2, 0.3], np.float32),
        votes=np.array([[0.0, 0.1, 0.2], [1.0, 1.1, 1.2]], np.float32),
        weights=np.array([0.5, 0.5], np.float32),
        class_ids=np.array([0, 1], np.uint32),
        instance_ids=np.array([0, 2], np.uint32),
        class_weights={0: 0.25, 1: 0.75},
        bbox_quats=np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32),
        bbox_sizes=np.array([[1, 1, 1], [2, 2, 2]], np.float32))
    data.distributions = [e]
    data.class_sigmas = {0: 0.1, 1: 0.2}
    data.dims_map = {0: (1.0, 2.0)}
    data.variance_map = {0: (0.1, 0.2)}
    data.global_features = {0: [[ba.RefGlobalFeature(
        rf=np.eye(3, dtype=np.float32).reshape(9),
        descriptor=np.ones(16, np.float32), radius=0.5, instance_id=0)]]}
    data.class_labels = ["a", "b"]
    data.instance_labels = ["a0", "a1", "b0"]
    p = tmp_path_factory.mktemp("fuzz") / "model.ismd"
    ba.write_ismd(str(p), data)
    raw = p.read_bytes()
    # sanity: the pristine archive round-trips
    back = ba.read_ismd(str(p))
    assert back.class_labels == ["a", "b"]
    assert len(back.distributions) == 1
    return raw


def _read_bytes(tmp_path, raw):
    p = tmp_path / "t.ismd"
    p.write_bytes(raw)
    return ba.read_ismd(str(p))


def test_truncations_raise_typed_errors(archive_bytes, tmp_path):
    """Truncating at ANY sampled length raises ValueError (typed), never
    struct.error / IndexError / hang."""
    n = len(archive_bytes)
    lengths = sorted({0, 1, 7, 8, 15, 29, 30, 31, 32, n // 4, n // 2,
                      n - 1, n - 4} | set(range(0, n, max(1, n // 97))))
    for ln in lengths:
        if ln >= n:
            continue
        with pytest.raises(ValueError):
            _read_bytes(tmp_path, archive_bytes[:ln])


def test_bad_signature(archive_bytes, tmp_path):
    raw = bytearray(archive_bytes)
    raw[8:12] = b"XXXX"  # corrupt signature text
    with pytest.raises(ValueError, match="not a boost binary archive"):
        _read_bytes(tmp_path, bytes(raw))
    # absurd signature length
    raw2 = struct.pack("<Q", 2 ** 40) + archive_bytes[8:]
    with pytest.raises(ValueError):
        _read_bytes(tmp_path, raw2)


def test_wrong_version_stamps(archive_bytes, tmp_path):
    """Any version stamp either parses (layout identical for our types at
    >= 6) or raises ValueError -- version 0-5 switches collection widths,
    making the stream inconsistent, which must be caught as truncation/
    corruption, not garbage output."""
    off = 8 + len(ba.SIGNATURE)
    for ver in (0, 3, 5, 6, 17, 99, 0xFFFF):
        raw = bytearray(archive_bytes)
        raw[off:off + 2] = struct.pack("<H", ver)
        try:
            out = _read_bytes(tmp_path, bytes(raw))
            # parsed: must be the true payload (versions >= 6 only)
            assert ver >= 6
            assert out.class_labels == ["a", "b"]
        except ValueError:
            pass


def test_corrupt_counts_fail_fast(archive_bytes, tmp_path):
    """Flipping each 4-byte word to huge/negative counts must raise
    ValueError quickly (the bounds-checked count contract) -- not loop
    over garbage for billions of iterations."""
    import time
    n = len(archive_bytes)
    for pos in range(8 + len(ba.SIGNATURE) + 2, min(n - 4, 400), 4):
        for val in (0x7FFFFFFF, 0xFFFFFFFF, 0x40000000):
            raw = bytearray(archive_bytes)
            raw[pos:pos + 4] = struct.pack("<I", val)
            t0 = time.monotonic()
            try:
                _read_bytes(tmp_path, bytes(raw))
            except ValueError:
                pass
            assert time.monotonic() - t0 < 5.0, \
                f"corrupt word at {pos} took too long"


def test_random_garbage_never_crashes(archive_bytes, tmp_path):
    """Random byte flips anywhere: parse returns data or raises
    ValueError; nothing else escapes."""
    rng = np.random.default_rng(0)
    n = len(archive_bytes)
    for _ in range(200):
        raw = bytearray(archive_bytes)
        for _ in range(rng.integers(1, 8)):
            raw[rng.integers(0, n)] = rng.integers(0, 256)
        try:
            _read_bytes(tmp_path, bytes(raw))
        except ValueError:
            pass


def test_pure_noise(tmp_path):
    rng = np.random.default_rng(1)
    for size in (0, 3, 10, 100, 4096):
        with pytest.raises(ValueError):
            _read_bytes(tmp_path, rng.bytes(size))
