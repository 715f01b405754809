"""Hard synthetic benchmark: 20 shape classes with rotations, noise,
partial views and occlusion bites.

The round-1 sanity benchmark (5 easy separable shapes) says nothing about
accuracy robustness; this set is the standing accuracy benchmark tracked in
the bench JSON every round (VERDICT r1 #3).  Classes share primitives with
varied proportions and composites, so local-descriptor quality actually
matters; test instances are rotated, noisier than training, cut to a
partial view (random half-space, simulating self-occlusion / single-view
scans) and bitten by a sphere occluder.
"""

import numpy as np

from shapes import box, cone, cylinder, ellipsoid, random_rotation, torus


def _sphere(rng, n, r=1.0, center=(0, 0, 0)):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r + np.asarray(center)).astype(np.float32)


def _merge(*parts):
    return np.concatenate(parts).astype(np.float32)


def _split(rng, n, fracs):
    counts = (np.asarray(fracs) / np.sum(fracs) * n).astype(int)
    counts[0] += n - counts.sum()
    return counts


def plate(rng, n):
    return ellipsoid(rng, n, 1.5, 1.0, 0.15)


def beam(rng, n):
    return box(rng, n, 2.0, 0.4, 0.4)


def thin_torus(rng, n):
    return torus(rng, n, R=1.2, r=0.12)


def dumbbell(rng, n):
    n1, n2, n3 = _split(rng, n, [2, 2, 1])
    rod = cylinder(rng, n3, r=0.15, h=1.6)
    rod = rod[:, [2, 0, 1]]  # axis along x
    return _merge(_sphere(rng, n1, 0.5, (-0.8, 0, 0)),
                  _sphere(rng, n2, 0.5, (0.8, 0, 0)), rod)


def l_shape(rng, n):
    n1, n2 = _split(rng, n, [1, 1])
    a = box(rng, n1, 1.6, 0.4, 0.4)
    b = box(rng, n2, 0.4, 0.4, 1.2) + [0.6, 0, 0.6]
    return _merge(a, b)


def cross3(rng, n):
    n1, n2, n3 = _split(rng, n, [1, 1, 1])
    a = box(rng, n1, 1.8, 0.35, 0.35)
    b = box(rng, n2, 0.35, 1.8, 0.35)
    c = box(rng, n3, 0.35, 0.35, 1.8)
    return _merge(a, b, c)


def pyramid(rng, n):
    # 4 triangular faces + square base, edge 1.6, height 1.2
    e, h = 1.6, 1.2
    apex = np.array([0, 0, h])
    corners = np.array([[e / 2, e / 2, 0], [-e / 2, e / 2, 0],
                        [-e / 2, -e / 2, 0], [e / 2, -e / 2, 0]])
    pts = []
    per = n // 5
    for i in range(4):
        a, b = corners[i], corners[(i + 1) % 4]
        u = np.sqrt(rng.random(per))
        v = rng.random(per) * u
        tri = apex + u[:, None] * (a - apex) + v[:, None] * (b - a)
        pts.append(tri)
    u = rng.uniform(-e / 2, e / 2, (n - 4 * per, 2))
    pts.append(np.concatenate([u, np.zeros((len(u), 1))], 1))
    p = np.concatenate(pts)
    return (p - p.mean(0)).astype(np.float32)


def bowl(rng, n):
    # lower half of an ellipsoid shell
    pts = []
    while sum(len(p) for p in pts) < n:
        e = ellipsoid(rng, n, 1.1, 1.1, 0.9)
        pts.append(e[e[:, 2] < 0])
    return np.concatenate(pts)[:n].astype(np.float32)


def capsule(rng, n):
    n1, n2, n3 = _split(rng, n, [2, 1, 1])
    side = cylinder(rng, n1, r=0.45, h=1.2)
    top = _sphere(rng, n2, 0.45, (0, 0, 0.6))
    bot = _sphere(rng, n3, 0.45, (0, 0, -0.6))
    top = top[top[:, 2] >= 0.6]
    bot = bot[bot[:, 2] <= -0.6]
    return _merge(side, top, bot)


def sphere_ring(rng, n):
    k = 6
    per = n // k
    parts = []
    for i in range(k):
        a = 2 * np.pi * i / k
        parts.append(_sphere(rng, per if i < k - 1 else n - per * (k - 1),
                             0.35, (np.cos(a), np.sin(a), 0)))
    return _merge(*parts)


def stairs(rng, n):
    n1, n2, n3 = _split(rng, n, [1, 1, 1])
    a = box(rng, n1, 1.5, 0.9, 0.35)
    b = box(rng, n2, 1.0, 0.9, 0.35) + [0.25, 0, 0.35]
    c = box(rng, n3, 0.5, 0.9, 0.35) + [0.5, 0, 0.7]
    p = _merge(a, b, c)
    return p - p.mean(0)


def tube(rng, n):
    u = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-0.5, 0.5, n)
    return np.stack([0.9 * np.cos(u), 0.9 * np.sin(u), z], 1).astype(np.float32)


def double_torus(rng, n):
    n1, n2 = _split(rng, n, [1, 1])
    a = torus(rng, n1, R=0.8, r=0.25) + [0, 0, 0.35]
    b = torus(rng, n2, R=0.8, r=0.25) - [0, 0, 0.35]
    return _merge(a, b)


def rocket(rng, n):
    n1, n2 = _split(rng, n, [2, 1])
    body = cylinder(rng, n1, r=0.45, h=1.2)
    nose = cone(rng, n2, r=0.45, h=0.9)
    nose = nose - nose.min(0) * [0, 0, 1] + [0, 0, 0.6]
    p = _merge(body, nose)
    return p - p.mean(0)


def saddle(rng, n):
    xy = rng.uniform(-1.0, 1.0, (n, 2))
    z = 0.6 * (xy[:, 0] ** 2 - xy[:, 1] ** 2)
    return np.stack([xy[:, 0], xy[:, 1], z], 1).astype(np.float32)


def fat_torus(rng, n):
    return torus(rng, n, R=0.7, r=0.45)


def tall_cone(rng, n):
    return cone(rng, n, r=0.5, h=2.2)


def flat_box(rng, n):
    return box(rng, n, 1.6, 1.3, 0.2)


def egg(rng, n):
    p = ellipsoid(rng, n, 0.7, 0.7, 1.1)
    p[:, 2] *= 1.0 + 0.25 * np.tanh(p[:, 2])  # asymmetric along z
    return p.astype(np.float32)


HARD_SHAPES = [
    ellipsoid, box, torus, cylinder, cone,            # 0-4 (base set)
    plate, beam, thin_torus, dumbbell, l_shape,       # 5-9
    cross3, pyramid, bowl, capsule, sphere_ring,      # 10-14
    stairs, tube, double_torus, rocket, saddle,       # 15-19
]
# spares for future widening without renumbering: fat_torus, tall_cone,
# flat_box, egg

NUM_HARD_CLASSES = len(HARD_SHAPES)


def partial_view(rng, pts, keep_frac):
    """Cut to a half-space keeping `keep_frac` of the points along a random
    direction (single-view / self-occlusion analogue)."""
    d = rng.normal(size=3)
    d /= np.linalg.norm(d)
    proj = pts @ d
    thresh = np.quantile(proj, keep_frac)
    return pts[proj <= thresh]


def occlusion_bite(rng, pts, bite_frac):
    """Remove the points inside a sphere around a random surface point sized
    to eat ~bite_frac of the cloud."""
    center = pts[rng.integers(len(pts))]
    d = np.linalg.norm(pts - center, axis=1)
    rho = np.quantile(d, bite_frac)
    return pts[d > rho]


def make_hard_instance(rng, class_id, n=2048, rotate=True, noise=0.01,
                       keep_frac=1.0, bite_frac=0.0):
    pts = HARD_SHAPES[class_id](rng, n).astype(np.float32)
    pts = pts - pts.mean(0)
    if keep_frac < 1.0:
        pts = partial_view(rng, pts, keep_frac)
    if bite_frac > 0.0:
        pts = occlusion_bite(rng, pts, bite_frac)
    if rotate:
        pts = pts @ random_rotation(rng).T
    pts = pts + rng.normal(scale=noise, size=pts.shape).astype(np.float32)
    return pts.astype(np.float32)


# ---------------------------------------------------------------------------
# benchmark runner (shared by tests/test_hard_benchmark.py and bench.py)
# ---------------------------------------------------------------------------


def model_cache_key(config: dict, clouds, labels) -> str:
    """Cache key for a trained benchmark model: hashes the full config JSON,
    the backend platform (CPU- and TPU-trained states may differ in fp
    reductions) and every training cloud byte-for-byte -- any change to the
    shape generators, seeds, counts or config invalidates the entry
    automatically."""
    import hashlib
    import json

    import jax
    h = hashlib.sha1(json.dumps(config, sort_keys=True).encode())
    h.update(jax.default_backend().encode())
    for c, l in zip(clouds, labels):
        h.update(np.int64(l).tobytes())
        h.update(np.ascontiguousarray(c, np.float32).tobytes())
    return h.hexdigest()[:20]


def load_or_train(ism, config: dict, train_clouds, train_labels,
                  cache_dir=None):
    """Train `ism` (which already has its training models added), or load a
    bit-equal previously trained state from cache_dir.  The cache exists so
    repeat bench runs spend their budget on MEASURED stages instead of
    re-training identical models (VERDICT r3 next #1); detection/accuracy
    always runs live.  Returns the (possibly replaced) model."""
    import os
    if cache_dir is None:
        ism.train()
        return ism
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    os.makedirs(cache_dir, exist_ok=True)
    key = model_cache_key(config, train_clouds, train_labels)
    path = os.path.join(cache_dir, key + ".ism")
    if os.path.exists(path) and os.path.exists(path + "d.npz"):
        return ImplicitShapeModel.load(path)
    ism.train()
    ism.save(path)
    return ism


def train_keep_frac(j: int) -> float:
    """Training-view visibility schedule: the first instance per class is a
    complete cloud, later ones are partial views -- mirroring the
    reference's training data for its RGB-D evaluations, which are
    single-view scans (i.e. partial by construction).  Both the base and the
    extended benchmark train on the same schedule so the global verifier
    sees the deployment distribution (VERDICT r2 next #4)."""
    return 1.0 if j == 0 else 0.75


def run_hard_benchmark(seed=7, n_train=3, n_test=2, n=2048,
                       num_classes=NUM_HARD_CLASSES, keep_frac=0.7,
                       bite_frac=0.1, noise=0.015, keypoint_capacity=384,
                       cache_dir=None, flann_exact=False):
    """Train on rotated instances (complete + partial views,
    train_keep_frac), classify rotated/noisy/partial/occluded test instances
    through the jitted fast path.  Returns (accuracy, per-class correct
    counts).  flann_exact=True classifies with exact brute-force chi-square
    activation instead of the default MXU feature-map approximation, for the
    exact-vs-approx accuracy A/B the bench records (the trained model is
    identical either way -- the flag only affects detection-time
    matching, implicit_shape_model.cpp:125)."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.models.pipeline_jit import (JitPipelineConfig,
                                                            classify_scores)
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    rng = np.random.default_rng(seed)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5,
            "ReferenceFrameType": "SHOT"}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB"}}}

    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    tmp = tempfile.mkdtemp()
    train_clouds, train_labels = [], []
    for cid in range(num_classes):
        for j in range(n_train):
            pts = make_hard_instance(rng, cid, n=n, rotate=True, noise=0.005,
                                     keep_frac=train_keep_frac(j))
            p = os.path.join(tmp, f"h{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
            train_clouds.append(pts)
            train_labels.append(cid)
    ism = load_or_train(ism, config, train_clouds, train_labels, cache_dir)
    cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)

    cfg = JitPipelineConfig(
        descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
        normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
        keypoint_capacity=keypoint_capacity, neighbor_capacity=1024,
        bandwidth=0.5, num_classes=num_classes)
    params = CodebookParams(knn_k=1, flann_exact=flann_exact)
    step = jax.jit(jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg, params)))

    # hard test set: rotated + noisier + partial view + occlusion bite
    tests, labels = [], []
    for cid in range(num_classes):
        for _ in range(n_test):
            pts = make_hard_instance(rng, cid, n=n, rotate=True, noise=noise,
                                     keep_frac=keep_frac, bite_frac=bite_frac)
            tests.append(pts)
            labels.append(cid)
    m = max(len(t) for t in tests)
    batch = np.zeros((len(tests), m, 3), np.float32)
    mask = np.zeros((len(tests), m), bool)
    for i, t in enumerate(tests):
        batch[i, :len(t)] = t
        batch[i, len(t):] = 1e9
        mask[i, :len(t)] = True

    scores = np.asarray(step(jnp.asarray(batch), jnp.asarray(mask)))
    pred = scores.argmax(axis=1)
    labels = np.asarray(labels)
    acc = float((pred == labels).mean())
    per_class = {c: int(((pred == labels) & (labels == c)).sum())
                 for c in range(num_classes)}
    return acc, per_class


# ---------------------------------------------------------------------------
# instance-label benchmark (the Washington/BigBird/YCB analogue: class AND
# instance accuracy, InstanceLabelsPrimary both ways; reference
# eval_helpers.h:46-61, README.md:33-35)
# ---------------------------------------------------------------------------

# deterministic anisotropic scalings: instances of a class are the same
# shape family with different proportions (like object instances within a
# category in the RGB-D datasets)
INSTANCE_SCALES = [
    (1.0, 1.0, 1.0),
    (0.85, 1.1, 1.0),
    (1.2, 0.9, 0.8),
    (0.95, 0.8, 1.25),
]


def make_instance_variant(rng, class_id, variant, n=2048, rotate=True,
                          noise=0.01, keep_frac=1.0, bite_frac=0.0):
    """A view of instance `variant` of class `class_id`: the class shape
    scaled by the variant's fixed factors (pre-rotation), then the usual
    view transformations."""
    pts = HARD_SHAPES[class_id](rng, n).astype(np.float32)
    pts = pts * np.asarray(INSTANCE_SCALES[variant], np.float32)
    pts = pts - pts.mean(0)
    if keep_frac < 1.0:
        pts = partial_view(rng, pts, keep_frac)
    if bite_frac > 0.0:
        pts = occlusion_bite(rng, pts, bite_frac)
    if rotate:
        pts = pts @ random_rotation(rng).T
    return (pts + rng.normal(scale=noise,
                             size=pts.shape).astype(np.float32)
            ).astype(np.float32)


def run_instance_benchmark(seed=11, num_classes=5, num_variants=4,
                           n_train_views=3, n_test_views=2, n=2048,
                           noise=0.015, keep_frac=0.85, cache_dir=None,
                           keypoint_capacity=256):
    """Train and evaluate the instance-label duality both ways
    (eval_helpers.h:46-61):

    * CLASS_PRIMARY: codebook keyed by class labels; instance prediction
      from per-vote instance ids (classify_scores_instances, the fused
      analogue of eval_classification.cpp:469-473).
    * INSTANCE_PRIMARY (the reference default): codebook keyed by instance
      labels; class prediction = instance_to_class[argmax].

    Returns a dict with class/instance accuracy for both modes."""
    import os
    import tempfile

    import jax
    import jax.numpy as jnp

    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        JitPipelineConfig, classify_scores, classify_scores_instances)
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    def base_config(instance_primary: bool) -> dict:
        return {"ObjectConfig": {"Children": {
            "Clustering": {"Type": "None"},
            "Codebook": {"Children": {"ActivationStrategy": {
                "Parameters": {"K": 1}, "Type": "KNN"}}},
            "FeatureWeighting": {"Type": "Uniform"},
            "Features": {"Parameters": {
                "Radius": 0.6, "ReferenceFrameRadius": 0.5,
                "ReferenceFrameType": "SHOT"}, "Type": "SHOT"},
            "GlobalFeatures": {"Type": "Dummy"},
            "Keypoints": {"Parameters": {"LeafSize": 0.35},
                          "Type": "VoxelGrid"},
            "Voting": {"Parameters": {
                "Bandwidth": 0.5, "SingleObjectMode": True,
                "SingleObjectMaxType": "BandwidthVotes"},
                "Type": "MeanShift"}},
            "Parameters": {"DistanceType": "ChiSquared",
                           "NormalRadius": 0.25,
                           "ConsistentNormalsMethod": 2,
                           "BoundingBoxType": "AABB",
                           "InstanceLabelsPrimary": instance_primary}}}

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(seed)
    # one shared training-view set (cloud bytes identical across modes so
    # the accuracy difference is purely the label-duality choice)
    train = []  # (path, class_id, instance_id, cloud)
    for cid in range(num_classes):
        for v in range(num_variants):
            inst = cid * num_variants + v
            for j in range(n_train_views):
                pts = make_instance_variant(
                    rng, cid, v, n=n, rotate=True, noise=0.005,
                    keep_frac=train_keep_frac(j))
                p = os.path.join(tmp, f"i{inst}_{j}.pcd")
                save_pcd(p, PointCloud(xyz=pts))
                train.append((p, cid, inst, pts))
    tests, t_cls, t_inst = [], [], []
    for cid in range(num_classes):
        for v in range(num_variants):
            for _ in range(n_test_views):
                tests.append(make_instance_variant(
                    rng, cid, v, n=n, rotate=True, noise=noise,
                    keep_frac=keep_frac))
                t_cls.append(cid)
                t_inst.append(cid * num_variants + v)
    m = max(len(t) for t in tests)
    batch = np.full((len(tests), m, 3), 1e9, np.float32)
    bmask = np.zeros((len(tests), m), bool)
    for i, t in enumerate(tests):
        batch[i, :len(t)] = t
        bmask[i, :len(t)] = True
    batch_j, bmask_j = jnp.asarray(batch), jnp.asarray(bmask)
    t_cls = np.asarray(t_cls)
    t_inst = np.asarray(t_inst)
    n_inst_total = num_classes * num_variants

    def jcfg(num_out):
        return JitPipelineConfig(
            descriptor="SHOT", radius=0.6, ref_frame_radius=0.5,
            leaf_size=0.35, normal_radius=0.25, normals_method=2,
            metric="chisq", knn_k=1, keypoint_capacity=keypoint_capacity,
            neighbor_capacity=1024, bandwidth=0.5, num_classes=num_out)

    params = CodebookParams(knn_k=1)
    out = {}

    # --- CLASS_PRIMARY: codebook by class, instances from vote ids --------
    cfg_a = base_config(False)
    ism_a = ImplicitShapeModel(IsmConfig.from_json(cfg_a))
    for p, cid, inst, _ in train:
        ism_a.add_training_model(p, cid, inst)
    ism_a = load_or_train(ism_a, cfg_a, [t[3] for t in train],
                          [t[1] for t in train], cache_dir)
    cb_a = jax.tree_util.tree_map(jnp.asarray, ism_a.state.codebook)
    step_a = jax.jit(jax.vmap(lambda p, mk: jnp.concatenate(
        classify_scores_instances(p, mk, cb_a, jcfg(num_classes), params,
                                  n_inst_total))))
    packed = np.asarray(step_a(batch_j, bmask_j))
    pred_c = packed[:, :num_classes].argmax(1)
    pred_i = packed[:, num_classes:].argmax(1)
    out["class_primary_class_acc"] = float((pred_c == t_cls).mean())
    out["class_primary_instance_acc"] = float((pred_i == t_inst).mean())

    # --- INSTANCE_PRIMARY: codebook by instance, class via the map --------
    cfg_b = base_config(True)
    ism_b = ImplicitShapeModel(IsmConfig.from_json(cfg_b))
    for p, cid, inst, _ in train:
        ism_b.add_training_model(p, inst, inst)
    ism_b = load_or_train(ism_b, cfg_b, [t[3] for t in train],
                          [t[2] for t in train], cache_dir)
    cb_b = jax.tree_util.tree_map(jnp.asarray, ism_b.state.codebook)
    step_b = jax.jit(jax.vmap(lambda p, mk: classify_scores(
        p, mk, cb_b, jcfg(n_inst_total), params)))
    scores_b = np.asarray(step_b(batch_j, bmask_j))
    pred_bi = scores_b.argmax(1)
    pred_bc = pred_bi // num_variants  # instance_to_class by construction
    out["instance_primary_class_acc"] = float((pred_bc == t_cls).mean())
    out["instance_primary_instance_acc"] = float((pred_bi == t_inst).mean())
    out["n_test_views"] = len(tests)
    return out


def run_hard_benchmark_extended(seed=7, n_train=3, n_test=2, n=2048,
                                num_classes=NUM_HARD_CLASSES, keep_frac=0.7,
                                bite_frac=0.1, noise=0.015, cache_dir=None):
    """The reference's *extended* pipeline variant on the hard set:
    ISM voting + ESF global descriptor + chi-square SVM verification merged
    into the hypothesis weights (README.md:26-29 "extended" = ranking /
    global verification; merge function 3).  Evaluated through the
    host-orchestrated detect path (global verification is not part of the
    fused serving program).  Returns (accuracy, global_only_accuracy)."""
    import os
    import tempfile

    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    rng = np.random.default_rng(seed)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5,
            "ReferenceFrameType": "SHOT"}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "ESF"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes",
            "UseGlobalFeatures": True,
            "GlobalFeaturesStrategy": "SVM",
            "GlobalFeatureInfluenceType": 3}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB",
                       "UseSvmTraining": True}}}

    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    tmp = tempfile.mkdtemp()
    train_clouds, train_labels = [], []
    for cid in range(num_classes):
        for j in range(n_train):
            pts = make_hard_instance(rng, cid, n=n, rotate=True, noise=0.005,
                                     keep_frac=train_keep_frac(j))
            p = os.path.join(tmp, f"he{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
            train_clouds.append(pts)
            train_labels.append(cid)
    ism = load_or_train(ism, config, train_clouds, train_labels, cache_dir)

    tests, labels = [], []
    for cid in range(num_classes):
        for _ in range(n_test):
            tests.append(make_hard_instance(rng, cid, n=n, rotate=True,
                                            noise=noise, keep_frac=keep_frac,
                                            bite_frac=bite_frac))
            labels.append(cid)
    correct = correct_global = 0
    for (maxima, _), cid in zip(ism.detect_batch(tests), labels):
        if maxima and maxima[0].class_id == cid:
            correct += 1
        if maxima and maxima[0].glob_class_id == cid:
            correct_global += 1
    return correct / len(tests), correct_global / len(tests)
