"""Batched / sharded serving CLI: classify a '# test' file list through the
fully-jitted forward step (models/pipeline_jit.classify_scores), batched over
clouds and sharded across every available chip via the data x model Mesh
(parallel/sharded.py).

This is the TPU-native serving path (SURVEY.md §2.4) — the parity eval tool
(cli/eval_classification.py) keeps the reference's host-orchestrated flow; this
one trades per-cloud keypoint compaction for one static program and prints
throughput alongside the accuracy."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ism import ImplicitShapeModel
from ..models.pipeline_jit import JitPipelineConfig
from ..parallel.sharded import make_mesh, shard_codebook, batched_classify
from ..utils.config import IsmConfig
from ..utils.io import load_cloud, parse_file_list


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(
        prog="serve", description="Batched sharded classification")
    p.add_argument("-d", "--detect", required=True, help="trained .ism model")
    p.add_argument("-f", "--file", required=True, help="'# test' file list")
    p.add_argument("--batch", type=int, default=16,
                   help="clouds per device step")
    p.add_argument("--points", type=int, default=2048,
                   help="pad/subsample clouds to this many points")
    p.add_argument("--devices", type=int, default=0,
                   help="limit the data mesh to this many devices "
                        "(0 = all available)")
    p.add_argument("--maxima", action="store_true",
                   help="run the full sharded detection step "
                        "(parallel/sharded.batched_detect) and print each "
                        "cloud's best maximum position per predicted class")
    p.add_argument("--aot-cache", default="",
                   help="directory for serialized AOT executables: first "
                        "run compiles and caches, later runs skip XLA "
                        "entirely (utils/aot.py; keyed by jax version, "
                        "device kind, config and shapes)")
    args = p.parse_args(argv)
    t_start = time.perf_counter()

    ism = ImplicitShapeModel.load(args.detect)
    cb = ism.state.codebook
    fcfg = ism._feature_cfg()
    kp_cfg = ism.config.child("Keypoints")
    vcfg = ism.config.child("Voting")
    cfg = JitPipelineConfig(
        descriptor=fcfg.type,
        radius=fcfg.radius,
        ref_frame_radius=fcfg.ref_frame_radius,
        leaf_size=kp_cfg.get("LeafSize", 0.02),
        normal_radius=ism.root.get("NormalRadius", 0.05),
        normals_method=ism.root.get("ConsistentNormalsMethod", 2),
        metric="chisq" if ism.root.get("DistanceType",
                                       "Euclidean") == "ChiSquared" else "l2",
        bandwidth=vcfg.get("Bandwidth", 0.1),
        num_classes=int(cb.class_sigma.shape[0]))

    fl = parse_file_list(args.file)
    labels = fl.instance_labels if fl.using_instances else fl.class_labels

    n_dev = len(jax.devices())
    if args.devices > 0:
        n_dev = min(n_dev, args.devices)
    from ..models.ism import _codebook_params
    cb_params = _codebook_params(ism.config.child("Codebook"))
    mesh = make_mesh(n_data=n_dev, n_model=1)
    cb_sharded = shard_codebook(cb, mesh)
    if args.maxima:
        from ..parallel.sharded import batched_detect
        if cfg.descriptor == "CSHOT":
            print("--maxima does not support CSHOT yet", file=sys.stderr)
            return 1
        step = batched_detect(mesh, cb_sharded, cfg, cb_params)
    else:
        step = batched_classify(mesh, cb_sharded, cfg, cb_params)
    compile_src = "jit"

    # load + pad/subsample all clouds to a fixed shape
    with_rgb = cfg.descriptor == "CSHOT"
    P = args.points
    clouds, masks, rgbs = [], [], []
    for fn in fl.filenames:
        pc = load_cloud(fn).remove_nan()
        xyz, rgb = pc.xyz, pc.rgb
        if with_rgb and rgb is None:
            print(f"{fn}: CSHOT needs RGB data", file=sys.stderr)
            return 1
        if len(xyz) > P:
            sel = np.random.default_rng(0).choice(len(xyz), P, replace=False)
            xyz = xyz[sel]
            rgb = rgb[sel] if rgb is not None else None
        pad = np.full((P, 3), 1e9, np.float32)
        pad[:len(xyz)] = xyz
        clouds.append(pad)
        m = np.zeros(P, bool)
        m[:len(xyz)] = True
        masks.append(m)
        if with_rgb:
            rp = np.zeros((P, 3), np.float32)
            rp[:len(xyz)] = rgb
            rgbs.append(rp)

    B = args.batch * n_dev
    n = len(clouds)
    n_pad = (-n) % B
    clouds += [clouds[0]] * n_pad
    masks += [masks[0]] * n_pad
    clouds_np = np.stack(clouds)
    masks_np = np.stack(masks)
    if with_rgb:
        rgbs += [rgbs[0]] * n_pad
        rgb_np = np.stack(rgbs)

    # optional AOT executable cache: skip XLA entirely on repeat starts
    # (the persistent *compilation* cache is known-slow on this backend;
    # serialized executables sidestep it, utils/aot.py)
    if args.aot_cache:
        from ..utils.aot import load_or_compile
        example = (jnp.asarray(clouds_np[:B]), jnp.asarray(masks_np[:B]))
        if with_rgb:
            example = example + (jnp.asarray(rgb_np[:B]),)
        key = (f"serve|{args.detect}|{cfg!r}|{cb_params!r}|B{B}|P{P}|"
               f"dev{n_dev}|maxima{args.maxima}|cw{cb.codewords.shape}")
        step, compile_src = load_or_compile(step, example, args.aot_cache,
                                            key)

    def call(i):
        a = (jnp.asarray(clouds_np[i:i + B]), jnp.asarray(masks_np[i:i + B]))
        if with_rgb:
            a = a + (jnp.asarray(rgb_np[i:i + B]),)
        return step(*a)

    # first result: compile (or AOT load) + first batch, fetched -- the
    # cold-start metric (time-to-first-result)
    first = call(0)
    first_np = [np.asarray(x) for x in first] if isinstance(first, tuple) \
        else np.asarray(first)
    ttfr = time.perf_counter() - t_start
    print(f" Time to first result: {ttfr:.1f} s ({compile_src})")

    preds = []
    maxima = []
    t0 = time.perf_counter()
    for i in range(0, len(clouds_np), B):
        out = call(i)
        if args.maxima:
            dens, pos = out
            preds.extend(np.asarray(dens).argmax(axis=1).tolist())
            maxima.extend(np.asarray(pos).tolist())
        else:
            preds.extend(np.asarray(out).argmax(axis=1).tolist())
    dt = time.perf_counter() - t0
    preds = preds[:n]

    correct = sum(int(p == g) for p, g in zip(preds, labels))
    for k, (fn, pr, gt) in enumerate(zip(fl.filenames, preds, labels)):
        extra = ""
        if args.maxima:
            x, y, z = maxima[k][pr]
            extra = f" maximum ({x:.3f} {y:.3f} {z:.3f})"
        print(f"{fn}: predicted {pr}, ground truth {gt} "
              f"{'OK' if pr == gt else 'WRONG'}{extra}")
    print(f"\n Accuracy: {100.0 * correct / max(n, 1):.0f} % ({correct}/{n})")
    print(f" Throughput: {n / dt:.1f} clouds/sec over {n_dev} device(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
