"""Per-stage throughput profiler for the serving fast path.

Measures the warm (post-compile) throughput of each stage of the fused
classification pipeline in isolation — normals, voxel-grid keypoints,
SHOT LRF, SHOT descriptors, codebook kNN activation + vote casting — plus
the fused whole, on the current JAX platform.  This is the optimization
instrument: run it on the real device to see where the FLOPs/bandwidth go
before touching any kernel (the reference profiles the same stages through
its per-step timer map, implicit_shape_model.cpp:636-709).

Timing discipline (axon tunnel): per-call sync timings are unreliable;
every number here is a batch-level loop of >= ``--rounds`` iterations
bracketed by ``block_until_ready``.

Usage::

    PCD_PLATFORM=cpu python -m point_cloud_donkey_tpu.cli.profile_stages
    python -m point_cloud_donkey_tpu.cli.profile_stages --batch 32 -n 2048

Prints one JSON object with clouds/sec per stage and the fused total.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="profile_stages")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("-n", "--points", type=int, default=2048)
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--classes", type=int, default=5)
    p.add_argument("--descriptor", default="SHOT",
                   choices=["SHOT", "CSHOT", "SHORT_SHOT"])
    # pipeline geometry overrides (defaults = JitPipelineConfig defaults;
    # pass the bench's values to profile the exact headline workload)
    p.add_argument("--radius", type=float, default=None)
    p.add_argument("--ref-frame-radius", type=float, default=None)
    p.add_argument("--leaf-size", type=float, default=None)
    p.add_argument("--normal-radius", type=float, default=None)
    p.add_argument("--kp-capacity", type=int, default=None)
    return p


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..models.codebook import CodebookParams
    from ..models.pipeline_jit import JitPipelineConfig, classify_scores
    from ..ops.lrf import shot_lrf
    from ..ops.normals import compute_normals_fast
    from ..ops.shot import cshot_descriptor_dense, shot_descriptor_dense
    from ..ops.short_shot import short_shot_descriptor_dense
    from ..ops.voxel_grid import voxel_grid

    B, N = args.batch, args.points
    overrides = {k: v for k, v in [
        ("radius", args.radius),
        ("ref_frame_radius", args.ref_frame_radius),
        ("leaf_size", args.leaf_size),
        ("normal_radius", args.normal_radius),
        ("keypoint_capacity", args.kp_capacity),
    ] if v is not None}
    cfg = JitPipelineConfig(descriptor=args.descriptor,
                            num_classes=args.classes, **overrides)
    params = CodebookParams(knn_k=1)
    needs_normals = args.descriptor != "SHORT_SHOT"
    needs_rgb = args.descriptor == "CSHOT"

    # synthetic batch: ellipsoid-ish shells, same scale as the bench
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=2, keepdims=True)
    pts *= np.array([1.3, 0.8, 0.5], np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    mask = np.ones((B, N), bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    rgb_j = jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32))

    # synthetic codebook (structure only; throughput does not depend on
    # trained quality) -- reuse the graft entry's builder
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
            "__graft_entry__.py"))
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    dim = {"SHOT": 352, "CSHOT": 1344, "SHORT_SHOT": 32}[args.descriptor]
    cb = graft._synthetic_codebook(dim=dim, num_classes=args.classes)

    # bf16 peak of the chip, for the MFU column (TPU v5e: 197 TFLOP/s;
    # the pipeline is mostly f32 so this is the honest UPPER bound --
    # f32 work can at best hit half of it)
    peaks = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v6 lite": 918e12}
    dev_kind = getattr(jax.devices()[0], "device_kind", "")
    peak_flops = next((v for k, v in peaks.items() if k in dev_kind), None)

    def timed(name, fn, *xs):
        """Warm `fn` then time `rounds` full-batch dispatches.

        Sync discipline: every stage output is reduced to ONE scalar on
        device (sum of sums — negligible vs the stage cost) and the timing
        loop ends with a host fetch of that scalar.  block_until_ready is
        NOT used: on the axon tunnel it returns without waiting for
        execution (measured 0.03 ms/batch "timings"), while a host fetch
        genuinely drains the queue.

        Each stage also reports XLA's static cost analysis (flops / bytes
        per batch), the achieved FLOP/s over the measured wall time, and —
        when the chip's peak is known — the model FLOPs utilization."""
        out = fn(*xs)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            out = fn(*xs)
        np.asarray(out)
        dt = time.perf_counter() - t0
        res = {"clouds_per_sec": round(B * args.rounds / dt, 2),
               "ms_per_batch": round(1e3 * dt / args.rounds, 2)}
        try:
            ca = fn.lower(*xs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            flops = float(ca.get("flops", 0.0))
            nbytes = float(ca.get("bytes accessed", 0.0))
            res["gflops_per_batch"] = round(flops / 1e9, 3)
            res["gbytes_per_batch"] = round(nbytes / 1e9, 3)
            achieved = flops * args.rounds / dt
            res["achieved_gflops_per_sec"] = round(achieved / 1e9, 2)
            if nbytes:
                res["achieved_gbytes_per_sec"] = round(
                    nbytes * args.rounds / dt / 1e9, 2)
                res["arithmetic_intensity"] = round(flops / nbytes, 2)
            if peak_flops:
                res["mfu_vs_bf16_peak"] = round(achieved / peak_flops, 5)
        except Exception:
            pass  # cost analysis is best-effort (older jax / exotic backend)
        return res

    def vm(f):
        """jit(vmap(f)) reduced to one scalar so timed()'s sync fetch is
        tiny on any transport."""
        batched = jax.vmap(f)

        def summed(*xs):
            out = batched(*xs)
            return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))

        return jax.jit(summed)

    stage_normals = vm(lambda p, m: compute_normals_fast(
        p, m, cfg.normal_radius))
    stage_voxel = vm(lambda p, m, c: voxel_grid(
        p, m, cfg.leaf_size, capacity=cfg.keypoint_capacity,
        features=c if needs_rgb else None).centroids)

    def _kp(p, m, c):
        kres = voxel_grid(p, m, cfg.leaf_size, capacity=cfg.keypoint_capacity,
                          features=c if needs_rgb else None)
        kp = jnp.where(kres.mask[:, None], kres.centroids[:, :3], 1e9)
        kp_rgb = kres.centroids[:, 3:6] if needs_rgb else None
        return kp, kres.mask, kp_rgb

    def lrf_only(p, m, c):
        kp, km, _ = _kp(p, m, c)
        return shot_lrf(kp, km, p, m, cfg.ref_frame_radius).frames

    def desc_only(p, m, c):
        """Keypoints + LRF + (normals if used) + the SELECTED descriptor --
        the same kernels extract_features_jit runs for this descriptor."""
        kp, km, kp_rgb = _kp(p, m, c)
        lrf = shot_lrf(kp, km, p, m, cfg.ref_frame_radius)
        if args.descriptor == "SHORT_SHOT":
            return short_shot_descriptor_dense(
                kp, lrf.frames, lrf.valid, p, m, cfg.radius).descriptors
        nrm = compute_normals_fast(p, m, cfg.normal_radius)
        if args.descriptor == "CSHOT":
            return cshot_descriptor_dense(
                kp, kp_rgb, lrf.frames, lrf.valid, p, nrm, c, m,
                cfg.radius).descriptors
        return shot_descriptor_dense(kp, lrf.frames, lrf.valid, p, nrm, m,
                                     cfg.radius).descriptors

    def full(p, m, c):
        return classify_scores(p, m, cb, cfg, params,
                               rgb=c if needs_rgb else None)

    # --- padding occupancy: how much of each padded capacity is real work --
    # (VERDICT r3 weak #5: low occupancy is where silent 10x losses hide)
    def occupancy():
        def _occ(p, m, c):
            kres = voxel_grid(p, m, cfg.leaf_size,
                              capacity=cfg.keypoint_capacity,
                              features=c if needs_rgb else None)
            kp = jnp.where(kres.mask[:, None], kres.centroids[:, :3], 1e9)
            d2 = ((kp[:, None, :] - p[None, :, :]) ** 2).sum(-1)
            in_r = (d2 <= cfg.radius * cfg.radius) \
                & kres.mask[:, None] & m[None, :]
            return kres.mask.sum(), in_r.sum(axis=1), kres.mask
        kp_n, nbr_n, kp_m = jax.jit(jax.vmap(_occ))(pts_j, mask_j, rgb_j)
        kp_n = np.asarray(kp_n)
        nbr = np.asarray(nbr_n)[np.asarray(kp_m)]
        return {
            "keypoint_capacity": cfg.keypoint_capacity,
            "keypoint_occupancy": round(float(kp_n.mean())
                                        / cfg.keypoint_capacity, 3),
            "mean_neighbors_in_radius": round(float(nbr.mean()), 1),
            "neighbor_occupancy_vs_cloud": round(float(nbr.mean()) / N, 3),
        }

    res = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "device_kind": dev_kind,
        "batch": B, "points": N, "rounds": args.rounds,
        "descriptor": args.descriptor,
        "occupancy": occupancy(),
        "voxel_keypoints": timed("voxel", stage_voxel, pts_j, mask_j, rgb_j),
        "kp+lrf": timed("lrf", vm(lrf_only), pts_j, mask_j, rgb_j),
        "kp+lrf+normals+desc": timed("desc", vm(desc_only), pts_j, mask_j,
                                     rgb_j),
        "fused_classify": timed("full", vm(full), pts_j, mask_j, rgb_j),
    }
    if needs_normals:
        res["normals_fast"] = timed("normals", stage_normals, pts_j, mask_j)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
