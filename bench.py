"""End-to-end benchmark suite (single chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The headline metric is the fully-jitted classification forward step
(keypoints -> normals -> SHOT LRF -> SHOT-352 descriptors -> exact-kNN
codebook activation -> vote casting -> class scores) on ModelNet-scale
synthetic clouds (2048 points), using a codebook trained on 5 synthetic
shape classes.  Baseline target: 100 clouds/sec/chip (BASELINE.json north
star; the reference publishes no throughput numbers -- it is a
single-process OpenMP CPU program).

"extra" carries the other measured paths (all clouds/sec unless noted):
  - mean_shift_clouds_per_sec: jitted forward step with the full per-class
    mean-shift maxima search (voting_mean_shift.cpp:201-376 semantics).
  - host_detect_clouds_per_sec: the host-orchestrated
    ImplicitShapeModel.detect path (maxima assembly included) -- the same
    code the eval CLIs run.
  - train_clouds_per_sec: full training pipeline (features + codebook
    activation + weights) over TRAIN_N synthetic clouds, programs warm
    (the compile-time cost is a one-off, reported as compile_s keys).
  - hard_accuracy: the standing 20-class accuracy benchmark
    (tests/hard_shapes.py): composite shapes, random rotations, extra
    noise, partial views, occlusion bites.
  - harder_accuracy_base/extended: the keep=0.6/noise=0.02/bite=0.15
    regime where SVM verification strictly beats the base pipeline (the
    reference's extended-pipeline claim, README.md:23-29).  Runs EARLY
    (right after the headline stages) so the driver record always carries
    this evidence (VERDICT r3 next #1).
  - sanity_accuracy: argmax-vs-label on the benchmark batch.

Stages run in priority order against a soft budget (BENCH_BUDGET_S env,
default 1500s); stages that would blow it are skipped and reported null.

Two caches keep repeat runs inside the budget (both safe: results are
bit-equal, and BENCH_NO_CACHE=1 disables the model cache):
  - bench_cache/: trained benchmark models keyed by config + training-cloud
    bytes + backend platform (tests/hard_shapes.py:model_cache_key);
    training-throughput measurement never uses it.
  - the persistent XLA compilation cache (utils/jax_cache.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

BASELINE_CLOUDS_PER_SEC = 100.0


def _device_alive(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator in a subprocess with a hard timeout: the axon
    service has transient outages where any device op blocks indefinitely;
    without this the whole bench would hang instead of reporting."""
    import subprocess
    code = ("import jax, jax.numpy as jnp; "
            "(jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready(); "
            "print('alive')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return b"alive" in r.stdout
    except Exception:
        return False


def _pallas_status(timeout_s: float = 240.0) -> str:
    """Probe pallas_call viability via the shared disk-cached probe
    (ops/pallas.probe_pallas): on the axon tunnel any pallas_call silently
    kills the whole process (no traceback), so the probe runs in a
    subprocess; conclusive verdicts are cached on disk so repeat bench
    runs don't pay the 80-240s subprocess backend init (under load the
    probe times out, which used to silently route the serving path off
    pallas, -30% headline).  Returns "ok" or "off"."""
    from point_cloud_donkey_tpu.ops.pallas import probe_pallas
    return "ok" if probe_pallas(timeout_s=timeout_s) else "off"


def main():
    import jax
    from point_cloud_donkey_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()

    # BENCH_PLATFORM=cpu: measure on the host CPU (skipping the accelerator
    # probe) so a round-long axon outage still yields a builder-measured
    # record; the driver's TPU run never sets this.
    force_cpu = os.environ.get("BENCH_PLATFORM", "") == "cpu"
    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Bounded wait-for-device loop: the axon service has transient
        # outages; a single dead probe should not zero the round's bench
        # record.  Probe, and if dead retry every 5 min until
        # BENCH_WAIT_FOR_DEVICE_S (default 30 min) is spent, then emit the
        # outage record.
        wait_budget = float(os.environ.get("BENCH_WAIT_FOR_DEVICE_S", "1800"))
        probe_t0 = time.perf_counter()
        alive, probes = _device_alive(), 1
        while not alive and (time.perf_counter() - probe_t0) < wait_budget:
            # never sleep past the remaining budget (a small budget should
            # yield the outage record promptly, not overshoot by minutes)
            time.sleep(max(0.0, min(
                300.0, wait_budget - (time.perf_counter() - probe_t0))))
            alive, probes = _device_alive(), probes + 1

        if not alive:
            extra = {"error": "device unresponsive (axon outage); "
                              "rerun when the service recovers",
                     "probes": probes,
                     "waited_s": round(time.perf_counter() - probe_t0, 0)}
            # the accuracy metrics are platform-independent: attach the
            # committed CPU-measured record so an outage round still
            # carries builder-verified evidence in the driver artifact
            cpu_rec = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "BENCH_LOCAL_CPU.json")
            try:
                with open(cpu_rec) as f:
                    extra["cpu_record"] = json.load(f)
            except Exception:
                pass
            print(json.dumps({
                "metric": "clouds/sec/chip end-to-end classification",
                "value": None, "unit": "clouds/sec", "vs_baseline": None,
                "extra": extra,
            }))
            return

    import jax.numpy as jnp
    import shapes
    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        JitPipelineConfig, classify_scores, classify_scores_mean_shift)
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
    import tempfile

    N = 2048
    NUM_CLASSES = 5
    # headline batch: throughput scales with batch on v5e (profiled 2412 /
    # 2607 / 2882 clouds/s at B=32/64/128, bench config) -- 128 amortizes
    # the dispatch + padding overheads; the mean-shift stage keeps its own
    # smaller batch to bound its (while_loop-heavy) compile time
    BATCH = 128
    ROUNDS = 8
    MS_BATCH = 32
    MS_ROUNDS = 16
    TRAIN_N = 24        # training-throughput clouds (warm programs)
    HOST_DETECT_N = 32  # host ImplicitShapeModel.detect_batch clouds

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    bench_t0 = time.perf_counter()

    def left():
        return budget_s - (time.perf_counter() - bench_t0)

    def stamp(name):
        # stage timeline on stderr (the driver parses only the stdout JSON);
        # this is how budget regressions get root-caused (VERDICT r3 weak #1)
        print(f"[bench {time.perf_counter() - bench_t0:7.1f}s] {name}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(42)

    cache_dir = None
    if os.environ.get("BENCH_NO_CACHE", "") != "1":
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_cache")

    # --- train a real codebook on synthetic shapes (host path) -------------
    config = {
        "ObjectConfig": {
            "Children": {
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
                    "Type": "MeanShift"},
            },
            "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                           "ConsistentNormalsMethod": 2,
                           "BoundingBoxType": "AABB"},
        }
    }
    import hard_shapes
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    tmp = tempfile.mkdtemp()
    tr_clouds, tr_labels = [], []
    for cid in range(NUM_CLASSES):
        pts = shapes.make_instance(rng, cid, n=N, rotate=False, noise=0.005)
        p = os.path.join(tmp, f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
        tr_clouds.append(pts)
        tr_labels.append(cid)
    stamp("setup: training models written")
    ism = hard_shapes.load_or_train(ism, config, tr_clouds, tr_labels,
                                    cache_dir)
    stamp("main model ready")
    cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)

    # capacities sized to the measured maxima for this workload
    # (max 157 keypoints / 839 in-radius neighbors over the shape set)
    # with headroom; shrinking padding is the single biggest perf lever
    cfg = JitPipelineConfig(
        descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
        normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
        keypoint_capacity=192, neighbor_capacity=896, bandwidth=0.5,
        num_classes=NUM_CLASSES,
        # headline runs the fused Pallas SHOT descriptor when the backend
        # supports pallas (self-gating inside classify_scores_batch;
        # measured 1.7x end-to-end vs the XLA one-hot path on v5e,
        # experiments/r5_roundup.py, decision parity 1.0)
        fused_descriptor=True)
    params = CodebookParams(knn_k=1)

    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores_batch)
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        _use_fused_descriptor)
    fused_active = bool(_use_fused_descriptor(cfg)[0])

    # --- benchmark data ------------------------------------------------------
    clouds = np.stack([
        shapes.make_instance(rng, i % NUM_CLASSES, n=N, rotate=True)
        for i in range(BATCH)])
    mask = np.ones((BATCH, N), bool)
    labels = np.arange(BATCH) % NUM_CLASSES

    pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)

    # --- headline config: calibrated sorted-axis normals window +
    # tile-compacted fused descriptors (round-6 structural levers; both
    # carry exactness flags, so the warmup FALLS BACK to the dense fused
    # path if a calibration cannot cover this batch).  Calibration is part
    # of serving setup (like keypoint_capacity sizing), not the timed loop;
    # the sort/compaction overheads themselves ARE in the timed program.
    nwin = tcap = 0
    if fused_active:
        from point_cloud_donkey_tpu.ops import binned
        from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
            required_tile_capacity)
        from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid
        try:
            nwin = binned.required_window(pts_j, mask_j, cfg.normal_radius,
                                          tile_q=256, align=128)
            kres = jax.jit(jax.vmap(lambda p, m: voxel_grid(
                p, m, cfg.leaf_size, capacity=cfg.keypoint_capacity)))(
                    pts_j, mask_j)
            tcap = required_tile_capacity(np.asarray(kres.mask))
        except Exception:
            nwin = tcap = 0
        if nwin and nwin >= N:
            nwin = 0  # window cannot prune; keep the dense normals
        cfg = cfg._replace(normals_window=int(nwin),
                           descriptor_tile_capacity=int(tcap))
    stamp(f"calibrated nwin={nwin} tcap={tcap}")

    def make_step(c):
        return jax.jit(lambda p, m: classify_scores_batch(p, m, cb, c,
                                                          params))

    step2 = make_step(cfg)

    # warmup / compile.  Timing sync is a HOST FETCH of the tiny [B, C]
    # scores (np.asarray), NOT block_until_ready: on the axon tunnel
    # block_until_ready returns immediately without waiting for execution
    # (measured 0.03 ms/batch "timings" with it), while a fetch genuinely
    # drains the dispatch queue.
    scores, exact_flag = step2(pts_j, mask_j)
    np.asarray(scores)
    if (nwin or tcap) and not bool(np.asarray(exact_flag)):
        # calibration missed this batch: results would be approximate --
        # fall back to the dense fused path (still one program)
        cfg = cfg._replace(normals_window=0, descriptor_tile_capacity=0)
        nwin = tcap = 0
        step2 = make_step(cfg)
        scores, _ = step2(pts_j, mask_j)
        np.asarray(scores)
        stamp("exactness flag tripped -> dense fallback")

    def step(p, m):
        return step2(p, m)[0]
    stamp("headline compiled + warm")

    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        scores = step(pts_j, mask_j)
    scores = np.asarray(scores)
    dt = time.perf_counter() - t0

    stamp("headline measured")
    clouds_per_sec = BATCH * ROUNDS / dt
    acc = float((np.argmax(np.asarray(scores), axis=1) == labels).mean())

    # --- mean-shift serving path (full per-class maxima search) -------------
    ms_clouds_per_sec = ms_acc = None
    if left() > 120:
        pts_ms, mask_ms = pts_j[:MS_BATCH], mask_j[:MS_BATCH]
        step_ms = jax.jit(jax.vmap(
            lambda p, m: classify_scores_mean_shift(p, m, cb, cfg, params)))
        s2 = step_ms(pts_ms, mask_ms)
        np.asarray(s2)
        t0 = time.perf_counter()
        for _ in range(MS_ROUNDS):
            s2 = step_ms(pts_ms, mask_ms)
        s2 = np.asarray(s2)  # hard sync (see headline-loop comment)
        ms_clouds_per_sec = round(
            MS_BATCH * MS_ROUNDS / (time.perf_counter() - t0), 2)
        ms_acc = float(
            (np.argmax(np.asarray(s2), axis=1) == labels[:MS_BATCH]).mean())

    stamp("mean-shift stage done")
    # --- harder accuracy pair: the extended-pipeline-wins evidence ----------
    # keep=0.6, noise=0.02, bite=0.15 is the regime where SVM verification
    # STRICTLY beats the base pipeline (the reference's extended-pipeline
    # claim, README.md:23-29).  This pair runs FIRST among the accuracy
    # stages so the driver's TPU record always carries it (VERDICT r3 #1).
    # n_test=10 -> 200 test views (10 per class), so the extended-vs-base
    # margin is measured in 0.5-pt quanta instead of the r4 single-view
    # 2.5-pt quantum (VERDICT r4 next #2a)
    harder_base = harder_ext = None
    HARDER_N_TEST = 10
    if left() > 300:
        harder_base, _ = hard_shapes.run_hard_benchmark(
            keep_frac=0.6, noise=0.02, bite_frac=0.15, n_test=HARDER_N_TEST,
            cache_dir=cache_dir)
        harder_ext, _ = hard_shapes.run_hard_benchmark_extended(
            keep_frac=0.6, noise=0.02, bite_frac=0.15, n_test=HARDER_N_TEST,
            cache_dir=cache_dir)

    stamp("harder pair done")
    # --- instance-label benchmark (Washington/BigBird/YCB analogue) ---------
    # class+instance accuracy with InstanceLabelsPrimary both ways
    # (VERDICT r4 next #2b; reference eval_helpers.h:46-61, README.md:33-35)
    inst_metrics = {}
    if left() > 300:
        inst_metrics = hard_shapes.run_instance_benchmark(
            cache_dir=cache_dir)

    stamp("instance benchmark done")
    # --- standing 20-class hard accuracy benchmark ---------------------------
    hard_acc = hard_acc_ext = hard_acc_global_only = hard_acc_exact = None
    if left() > 240:
        hard_acc, _per_class = hard_shapes.run_hard_benchmark(
            cache_dir=cache_dir)

    # exact-vs-approx activation A/B (VERDICT r3 #10): same trained model
    # (cached), same views, exact brute-force chi-square instead of the
    # default MXU feature-map approximation
    if left() > 180:
        hard_acc_exact, _ = hard_shapes.run_hard_benchmark(
            cache_dir=cache_dir, flann_exact=True)

    stamp("hard 20-class done")
    # extended pipeline (ISM + ESF + chi2-SVM verification, merge fn 3):
    # exercises the full verification subsystem every round.  NB the global
    # descriptor sees partial/occluded views, so global-only accuracy is
    # low by construction (the reference reports partial-view datasets
    # separately for the same reason, README.md:33).
    if left() > 240:
        hard_acc_ext, hard_acc_global_only = \
            hard_shapes.run_hard_benchmark_extended(cache_dir=cache_dir)

    stamp("hard extended done")
    # --- training throughput (warm programs; NEVER cache-assisted) ----------
    train_clouds_per_sec = None
    train_stage_ms = None
    if left() > 120:
        # warm the training programs with an untimed SAME-SHAPE run first:
        # the model cache means the setup phase no longer trains live, and
        # the activation/sigma programs are keyed on pow2 codeword buckets,
        # so the warm-up must reach the SAME buckets as the measured set
        # (a 2-cloud warm-up left the 24-cloud bucket compiling inside the
        # measured window: 1.36 clouds/s instead of the warm rate)
        ism_w = ImplicitShapeModel(IsmConfig.from_json(config))
        for i in range(TRAIN_N):
            cid = i % NUM_CLASSES
            pts = shapes.make_instance(rng, cid, n=N, rotate=True,
                                       noise=0.005)
            p = os.path.join(tmp, f"tw{i}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism_w.add_training_model(p, cid, cid)
        ism_w.train()
        stamp("train programs warm")
        ism_t = ImplicitShapeModel(IsmConfig.from_json(config))
        for i in range(TRAIN_N):
            cid = i % NUM_CLASSES
            pts = shapes.make_instance(rng, cid, n=N, rotate=True, noise=0.005)
            p = os.path.join(tmp, f"tt{i}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism_t.add_training_model(p, cid, cid)
        t0 = time.perf_counter()
        ism_t.train()
        train_clouds_per_sec = round(TRAIN_N / (time.perf_counter() - t0), 2)
        # per-stage training wall breakdown (ms/cloud), from the train()
        # instrumentation -- the training analogue of PROFILE_TPU.md
        train_stage_ms = {
            k: round(v * 1000.0 / TRAIN_N, 2)
            for k, v in sorted(ism_t.processing_times.items())
            if k.startswith("train_")}

    stamp("train throughput done")
    # --- host-orchestrated detect() (the eval-CLI path) ----------------------
    # measured through detect_batch: same per-cloud decisions as detect()
    # (pinned by tests/test_detection.py), device stages batched across
    # clouds.  host_detect_single_clouds_per_sec measures the per-call API
    # (now routed through the fused B=1 program).
    host_clouds_per_sec = host_acc = host_single_clouds_per_sec = None
    if left() > 120:
        # warm the per-bucket compile caches (feature counts vary per cloud)
        # so the metric reports steady-state throughput
        ism.detect_batch([clouds[i] for i in range(min(8, HOST_DETECT_N))])
        t0 = time.perf_counter()
        results = ism.detect_batch([clouds[i] for i in range(HOST_DETECT_N)])
        host_dt = time.perf_counter() - t0
        host_correct = sum(
            1 for i, (maxima, _) in enumerate(results)
            if maxima and maxima[0].class_id == labels[i])
        host_clouds_per_sec = round(HOST_DETECT_N / host_dt, 2)
        host_acc = host_correct / HOST_DETECT_N
        if left() > 120:
            # per-call API number (fused B=1 path; warm it over the
            # capacity variants first, then time the steady state)
            for i in range(min(8, HOST_DETECT_N)):
                ism.detect(clouds[i])
            t0 = time.perf_counter()
            for i in range(min(8, HOST_DETECT_N)):
                ism.detect(clouds[i])
            host_single_clouds_per_sec = round(
                min(8, HOST_DETECT_N) / (time.perf_counter() - t0), 2)

    stamp("host detect done")
    # --- scene-scale detection (tiled neighbor path, ops/tiled.py) -----------
    scene_pts_per_sec = scene_points = scene_recall = scene_ap = None
    if left() > 240:
        scfg = {"ObjectConfig": {"Children": {
            "Clustering": {"Type": "None"},
            "Codebook": {"Children": {"ActivationStrategy": {
                "Parameters": {"K": 1}, "Type": "KNN"}}},
            "FeatureWeighting": {"Type": "Uniform"},
            "Features": {"Parameters": {
                "Radius": 0.6, "ReferenceFrameRadius": 0.5},
                "Type": "SHORT_SHOT"},
            "GlobalFeatures": {"Type": "Dummy"},
            "Keypoints": {"Parameters": {"LeafSize": 0.3}, "Type": "VoxelGrid"},
            "Voting": {"Parameters": {
                "Bandwidth": 0.6, "SingleObjectMode": False,
                "MinThreshold": -0.2, "MaxFilterType": "Merge",
                "MinVotesThreshold": 3}, "Type": "MeanShift"}},
            "Parameters": {"DistanceType": "ChiSquared",
                           "BoundingBoxType": "AABB"}}}
        ism_s = ImplicitShapeModel(IsmConfig.from_json(scfg))
        # curved classes: flat-faced objects in planar-clutter scenes are
        # the classic ISM failure mode (box faces == plane patches), so the
        # standing scene benchmark tracks curved-object detection
        s_clouds, s_labels = [], []
        for cid in (2, 4):
            for j in range(2):
                pts = shapes.make_instance(rng, cid, n=2000, rotate=False)
                p = os.path.join(tmp, f"s{cid}{j}.pcd")
                save_pcd(p, PointCloud(xyz=pts))
                ism_s.add_training_model(p, cid, cid)
                s_clouds.append(pts)
                s_labels.append(cid)
        ism_s = hard_shapes.load_or_train(ism_s, scfg, s_clouds, s_labels,
                                          cache_dir)
        # 120k-point composed MULTI-INSTANCE scene: 2 objects per class at
        # spread positions + dense ground + clutter distractors, so the
        # stage measures per-class AP with greedy GT matching
        # (eval_helpers_detection.h:125-339 semantics via models/metrics),
        # not just a recall bit (VERDICT r4 next #4)
        obj_specs = [(2, (0.0, 0.0, 0.0)), (2, (4.0, -2.5, 0.0)),
                     (4, (5.0, 0.0, 0.0)), (4, (-3.5, 2.0, 0.0))]
        parts, gts = [], []
        for cid_o, off in obj_specs:
            pts_o = shapes.make_instance(rng, cid_o, n=10000, rotate=False) \
                + np.asarray(off, np.float32)
            parts.append(pts_o)
            gts.append((cid_o, pts_o.mean(0)))
        gx = rng.uniform(-6, 9, 70000)
        gy = rng.uniform(-6, 6, 70000)
        ground = np.stack([gx, gy, np.full_like(gx, -1.2)
                           + rng.normal(scale=0.01, size=gx.shape)], 1)
        clutter = rng.uniform(-3, 8, (10000, 3)) * [1, 1, 0.1] + [0, 4.5, 1.5]
        scene = np.concatenate(
            parts + [ground, clutter]).astype(np.float32)
        ism_s.detect(scene)  # compile
        t0 = time.perf_counter()
        maxima_s, _ = ism_s.detect(scene)
        scene_dt = time.perf_counter() - t0
        scene_points = len(scene)
        scene_pts_per_sec = round(scene_points / scene_dt, 0)
        # recall: every GT found within 0.8 of its center
        found = 0
        for cid_gt, pos_gt in gts:
            if any(m.class_id == cid_gt
                   and np.linalg.norm(m.position - pos_gt) < 0.8
                   for m in maxima_s):
                found += 1
        scene_recall = found / len(gts)
        # per-class AP over ALL ranked maxima (greedy distance matching)
        from point_cloud_donkey_tpu.models.metrics import (
            DetectionObject, compute_all_metrics, rearrange_objects)

        def _dobj(cid_o, pos, conf=1.0):
            return DetectionObject(
                class_label=str(cid_o), instance_label=str(cid_o),
                global_class_label=str(cid_o),
                position=np.asarray(pos, np.float32), occlusion_ratio=0.0,
                confidence=float(conf), filepath="bench", cloud_filepath="bench",
                bb_extent=np.zeros(3, np.float32),
                bb_quat=np.array([1, 0, 0, 0], np.float32))

        gt_objs = rearrange_objects([_dobj(c, p) for c, p in gts])
        det_objs = rearrange_objects(
            [_dobj(m.class_id, m.position, m.weight) for m in maxima_s])
        aps = [compute_all_metrics(gt_objs[lbl], det_objs.get(lbl, []),
                                   0.8)[2] for lbl in sorted(gt_objs)]
        scene_ap = round(float(np.mean(aps)), 4) if aps else None

    stamp("scene stage done")
    # --- Hough3D voting variant on the SAME scene + trained state -----------
    # the discrete voting alternative (voting_hough_3d.cpp:19-23), measured
    # on-chip with decision parity vs mean-shift (VERDICT r4 next #5)
    hough_pts_per_sec = hough_recall = hough_ap = None
    if scene_pts_per_sec is not None and left() > 180:
        hcfg = json.loads(json.dumps(scfg))
        hcfg["ObjectConfig"]["Children"]["Voting"] = {
            "Type": "Hough3D",
            "Parameters": {"MinCoord": [-10.0, -10.0, -10.0],
                           "MaxCoord": [10.0, 10.0, 10.0],
                           "Bandwidth": 0.6, "UseInterpolation": True,
                           "RelThreshold": 0.5, "MinThreshold": -0.2,
                           "MinVotesThreshold": 3,
                           "MaxFilterType": "Merge"}}
        ism_h = ImplicitShapeModel(IsmConfig.from_json(hcfg))
        ism_h.state = ism_s.state
        ism_h.detect(scene)  # compile
        t0 = time.perf_counter()
        maxima_h, _ = ism_h.detect(scene)
        hough_pts_per_sec = round(len(scene) / (time.perf_counter() - t0), 0)
        found_h = 0
        for cid_gt, pos_gt in gts:
            if any(m.class_id == cid_gt
                   and np.linalg.norm(m.position - pos_gt) < 0.8
                   for m in maxima_h):
                found_h += 1
        hough_recall = found_h / len(gts)
        det_h = rearrange_objects(
            [_dobj(m.class_id, m.position, m.weight) for m in maxima_h])
        aps_h = [compute_all_metrics(gt_objs[lbl], det_h.get(lbl, []),
                                     0.8)[2] for lbl in sorted(gt_objs)]
        hough_ap = round(float(np.mean(aps_h)), 4) if aps_h else None

    stamp("hough variant done")
    # --- pallas viability (VERDICT r2 #9: re-probe each round) ---------------
    # last: a probe, not a measurement -- it must never starve the accuracy
    # or throughput stages (VERDICT r3 weak #1)
    pallas = None
    if not force_cpu and left() > 150:
        pallas = _pallas_status(timeout_s=min(120.0, max(30.0, left() - 20)))

    stamp("pallas probe done")
    print(json.dumps({
        "metric": "clouds/sec/chip end-to-end classification (2048-pt clouds, SHOT-352 + kNN codebook + voting)",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
        "extra": {"batch": BATCH, "rounds": ROUNDS, "points": N,
                  "sanity_accuracy": acc,
                  "mean_shift_clouds_per_sec": ms_clouds_per_sec,
                  "mean_shift_accuracy": ms_acc,
                  "host_detect_clouds_per_sec": host_clouds_per_sec,
                  "host_detect_single_clouds_per_sec": host_single_clouds_per_sec,
                  "host_detect_accuracy": host_acc,
                  "train_clouds_per_sec": train_clouds_per_sec,
                  "train_stage_ms_per_cloud": train_stage_ms,
                  "train_n": TRAIN_N,
                  "hard_accuracy_20class": hard_acc,
                  "hard_accuracy_20class_exact_chisq": hard_acc_exact,
                  "hard_accuracy_20class_extended": hard_acc_ext,
                  "hard_accuracy_global_only": hard_acc_global_only,
                  "harder_accuracy_base": harder_base,
                  "harder_accuracy_extended": harder_ext,
                  "harder_n_views": HARDER_N_TEST * 20,
                  "instance_class_primary_class_acc":
                      inst_metrics.get("class_primary_class_acc"),
                  "instance_class_primary_instance_acc":
                      inst_metrics.get("class_primary_instance_acc"),
                  "instance_primary_class_acc":
                      inst_metrics.get("instance_primary_class_acc"),
                  "instance_primary_instance_acc":
                      inst_metrics.get("instance_primary_instance_acc"),
                  "instance_n_views": inst_metrics.get("n_test_views"),
                  "scene_detect_pts_per_sec": scene_pts_per_sec,
                  "scene_points": scene_points,
                  "scene_recall": scene_recall,
                  "scene_detect_ap": scene_ap,
                  "scene_n_objects": 4,
                  "hough_scene_pts_per_sec": hough_pts_per_sec,
                  "hough_scene_recall": hough_recall,
                  "hough_scene_ap": hough_ap,
                  "normals_window": nwin,
                  "descriptor_tile_capacity": tcap,
                  "pallas": pallas,
                  "fused_descriptor": fused_active,
                  "bench_wall_s": round(time.perf_counter() - bench_t0, 1),
                  "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
