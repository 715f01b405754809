"""Train the CGF embedding MLP on synthetic correspondences.

The reference's CGF descriptor (features_cgf.cpp:46-68) pipes raw spherical
histograms through a downloaded TensorFlow checkpoint
(third_party/cgf/embedding.py).  That checkpoint is not redistributable, so
this tool trains an equivalent compact embedding from scratch: anchor /
positive pairs are raw CGF histograms of the SAME surface location under
independent sampling, noise and rotation; negatives are other locations in
the batch.  An NT-Xent (InfoNCE) objective pulls correspondences together in
the 32-D embedding space -- the property the CGF paper trains for (Khoury,
Zhou, Funkhouser ICCV'17), learned here on synthetic shapes.

The shipped checkpoint (point_cloud_donkey_tpu/data/cgf_embedding.npz) was
produced by this tool; retrain with different shapes/scales for a specific
domain:

    python -m point_cloud_donkey_tpu.cli.train_cgf_embedding \
        --out my_embedding.npz --pairs 3000 --steps 600
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def generate_pairs(n_pairs: int, n_points: int, radius: float, seed: int,
                   kp_per_instance: int = 16):
    """[P, 2244] x 2 raw-histogram correspondence pairs."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "tests"))
    import shapes

    from ..ops.cgf import cgf_raw_histogram
    from ..ops.lrf import shot_lrf
    from ..ops.neighbors import gather_radius_neighbors
    from ..ops.normals import compute_normals_fast

    rng = np.random.default_rng(seed)

    @jax.jit
    def hists(kp, pts):
        mask = jnp.ones(pts.shape[0], bool)
        kmask = jnp.ones(kp.shape[0], bool)
        nrm = compute_normals_fast(pts, mask, 0.5 * radius)
        lrf = shot_lrf(kp, kmask, pts, mask, 0.75 * radius)
        nbr = gather_radius_neighbors(kp, pts, mask, radius, capacity=512)
        kp_nrm = nrm[nbr.idx[:, 0]]
        return cgf_raw_histogram(kp, kp_nrm, lrf.frames, lrf.valid, pts,
                                 nbr, radius), lrf.valid

    anchors, positives = [], []
    n_inst = -(-n_pairs // kp_per_instance)
    for i in range(n_inst):
        cid = int(rng.integers(len(shapes.SHAPES)))
        # two independent samplings of the same geometry, different noise,
        # different rotations; keypoints correspond through the rotations
        rot_a = shapes.random_rotation(rng)
        rot_b = shapes.random_rotation(rng)
        base_a = shapes.SHAPES[cid](np.random.default_rng(1000 + i), n_points)
        base_b = shapes.SHAPES[cid](np.random.default_rng(2000 + i), n_points)
        kp_sel = rng.choice(len(base_a), kp_per_instance, replace=False)
        kp_base = base_a[kp_sel]

        def noisy(base, rot):
            p = base @ rot.T
            return (p + rng.normal(scale=0.008, size=p.shape)
                    ).astype(np.float32)

        import jax.numpy as jnp
        pa = noisy(base_a, rot_a)
        pb = noisy(base_b, rot_b)
        ka = (kp_base @ rot_a.T).astype(np.float32)
        kb = (kp_base @ rot_b.T).astype(np.float32)
        ha, va = hists(jnp.asarray(ka), jnp.asarray(pa))
        hb, vb = hists(jnp.asarray(kb), jnp.asarray(pb))
        ok = np.asarray(va) & np.asarray(vb)
        anchors.append(np.asarray(ha)[ok])
        positives.append(np.asarray(hb)[ok])
    a = np.concatenate(anchors)[:n_pairs]
    p = np.concatenate(positives)[:n_pairs]
    return a.astype(np.float32), p.astype(np.float32)


def train(anchors: np.ndarray, positives: np.ndarray, dims, steps: int,
          batch: int, lr: float, seed: int, temperature: float = 0.1):
    import jax
    import jax.numpy as jnp
    import optax

    layers = []
    key = jax.random.PRNGKey(seed)
    d_in = anchors.shape[1]
    for d_out in dims:
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (d_in, d_out)) * np.sqrt(2.0 / d_in)
        layers.append({"w": w, "b": jnp.zeros(d_out)})
        d_in = d_out
    params = layers

    def forward(params, x):
        for i, lyr in enumerate(params):
            x = x @ lyr["w"] + lyr["b"]
            if i < len(params) - 1:
                x = jax.nn.relu(x)
        return x

    def loss_fn(params, xa, xp):
        za = forward(params, xa)
        zp = forward(params, xp)
        za = za / jnp.maximum(jnp.linalg.norm(za, axis=1, keepdims=True), 1e-9)
        zp = zp / jnp.maximum(jnp.linalg.norm(zp, axis=1, keepdims=True), 1e-9)
        logits = za @ zp.T / temperature          # [B, B]
        labels = jnp.arange(xa.shape[0])
        return (optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean()) / 2.0

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xa, xp):
        loss, grads = jax.value_and_grad(loss_fn)(params, xa, xp)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(anchors)
    for s in range(steps):
        sel = rng.choice(n, min(batch, n), replace=False)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(anchors[sel]),
                                       jnp.asarray(positives[sel]))
        if s % 50 == 0 or s == steps - 1:
            print(f"step {s}: loss {float(loss):.4f}", flush=True)
    return [(np.asarray(l["w"], np.float32), np.asarray(l["b"], np.float32))
            for l in params]


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    ap = argparse.ArgumentParser(
        prog="train_cgf_embedding",
        description="Train the CGF 32-D embedding on synthetic correspondences")
    ap.add_argument("--out", default="cgf_embedding.npz")
    ap.add_argument("--pairs", type=int, default=2000)
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--radius", type=float, default=0.6)
    ap.add_argument("--dims", type=int, nargs="*", default=[512, 64, 32])
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    t0 = time.time()
    a, p = generate_pairs(args.pairs, args.points, args.radius, args.seed)
    print(f"generated {len(a)} correspondence pairs in {time.time()-t0:.0f}s",
          flush=True)
    weights = train(a, p, args.dims, args.steps, args.batch, args.lr,
                    args.seed)
    out = {}
    for i, (w, b) in enumerate(weights):
        out[f"w{i}"] = w
        out[f"b{i}"] = b
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
