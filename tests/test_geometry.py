import numpy as np
import jax.numpy as jnp
import pytest

from point_cloud_donkey_tpu.ops import geometry as geo


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(geo.quat_to_matrix(jnp.asarray(q, jnp.float32)))


def test_quat_rotate_matches_matrix(rng):
    for _ in range(5):
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        v = rng.normal(size=3).astype(np.float32)
        R = np.asarray(geo.quat_to_matrix(jnp.asarray(q)))
        out = np.asarray(geo.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        np.testing.assert_allclose(out, R @ v, rtol=1e-4, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(10):
        R = random_rotation(rng)
        q = geo.matrix_to_quat(jnp.asarray(R, jnp.float32))
        R2 = np.asarray(geo.quat_to_matrix(q))
        np.testing.assert_allclose(R2, R, rtol=1e-4, atol=1e-4)


def test_rotate_into_back_roundtrip(rng):
    R = random_rotation(rng).astype(np.float32)  # rows = axes (orthonormal)
    v = rng.normal(size=3).astype(np.float32)
    local = geo.rotate_into(jnp.asarray(v), jnp.asarray(R))
    # rotate_into projects onto rows
    np.testing.assert_allclose(np.asarray(local), R @ v, rtol=1e-4, atol=1e-5)
    back = geo.rotate_back(local, jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(back), v, rtol=1e-3, atol=1e-5)


def test_frame_quat_consistency(rng):
    """quat encoding of a frame must act like rotate_into."""
    R = random_rotation(rng).astype(np.float32)
    v = rng.normal(size=3).astype(np.float32)
    q = geo.frame_to_quat(jnp.asarray(R))
    np.testing.assert_allclose(
        np.asarray(geo.quat_rotate(q, jnp.asarray(v))),
        np.asarray(geo.rotate_into(jnp.asarray(v), jnp.asarray(R))),
        rtol=1e-3, atol=1e-4)


def test_aabb(rng):
    pts = rng.uniform(-1, 2, size=(100, 3)).astype(np.float32)
    mask = np.ones(100, bool)
    box = geo.compute_aabb(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(box.size),
                               pts.max(0) - pts.min(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(box.position),
                               (pts.max(0) + pts.min(0)) / 2, rtol=1e-4, atol=1e-5)


def test_aabb_respects_mask(rng):
    pts = rng.uniform(-1, 1, size=(50, 3)).astype(np.float32)
    pts[40:] = 100.0  # masked-out outliers
    mask = np.arange(50) < 40
    box = geo.compute_aabb(jnp.asarray(pts), jnp.asarray(mask))
    assert np.all(np.asarray(box.size) < 3.0)


def test_mvbb_beats_aabb_on_rotated_box(rng):
    # A box rotated 45 degrees: MVBB volume should be well below AABB volume.
    base = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    base[:, 2] *= 0.2
    theta = np.pi / 4
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], np.float32)
    pts = base @ R.T
    mask = np.ones(len(pts), bool)
    aabb = geo.compute_aabb(jnp.asarray(pts), jnp.asarray(mask))
    mvbb = geo.compute_mvbb(jnp.asarray(pts), jnp.asarray(mask))
    vol_aabb = float(np.prod(np.asarray(aabb.size)))
    vol_mvbb = float(np.prod(np.asarray(mvbb.size)))
    assert vol_mvbb < 0.8 * vol_aabb
    # MVBB center must map back near the true center (origin)
    assert np.linalg.norm(np.asarray(mvbb.position)) < 0.1


def test_cloud_radius(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    mask = np.ones(500, bool)
    r = float(geo.cloud_radius(jnp.asarray(pts), jnp.asarray(mask)))
    c = pts.mean(0)
    np.testing.assert_allclose(r, np.linalg.norm(pts - c, axis=1).max(), rtol=1e-5)


def test_quat_weighted_average_identity(rng):
    q = jnp.asarray(np.tile([1.0, 0, 0, 0], (5, 1)), jnp.float32)
    w = jnp.ones(5, jnp.float32)
    avg = np.asarray(geo.quat_weighted_average(q, w))
    avg = avg * np.sign(avg[0])
    np.testing.assert_allclose(avg, [1, 0, 0, 0], atol=1e-5)


def test_emst_normal_orientation():
    # a plane with randomly flipped PCA normals: EMST propagation should make
    # them globally consistent (ConsistentNormalsMethod 3)
    from point_cloud_donkey_tpu.ops.normals import orient_emst
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-1, 1, (600, 2)),
                          np.zeros((600, 1))], axis=1).astype(np.float32)
    nrm = np.tile(np.array([0., 0, 1], np.float32), (600, 1))
    flip = rng.random(600) < 0.5
    nrm[flip] *= -1.0
    out = orient_emst(pts, nrm)
    s = np.sign(out[:, 2])
    assert np.all(s == s[0])        # all consistent
    assert s[0] > 0                 # root oriented +z


def test_mvbb_batch_matches_single():
    """The chunked/vmapped MVBB used by train() matches the per-model
    program to fp32 ulp (XLA fuses the vmapped sweep differently, so exact
    bit-equality is not guaranteed)."""
    import shapes
    from point_cloud_donkey_tpu.models.ism import _mvbb_host, _mvbb_host_batch
    rng = np.random.default_rng(0)
    clouds = [shapes.make_instance(rng, c % 5, n=n,
                                   rotate=True).astype(np.float32)
              for c, n in enumerate([900, 1400, 2048, 700, 2048, 900, 1100])]
    batch = _mvbb_host_batch(clouds)
    for xyz, bb in zip(clouds, batch):
        single = _mvbb_host(xyz)
        np.testing.assert_allclose(bb.position, single.position,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(bb.size, single.size, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(bb.quat, single.quat, rtol=1e-5, atol=1e-5)
