"""Stage sweep of the fused SHOT kernel on the real TPU: find which
section crashes the remote compiler."""
import json, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "."); sys.path.insert(0, "tests")
import shapes
from point_cloud_donkey_tpu.ops.pallas.shot_fused import shot_descriptor_fused
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
rng = np.random.default_rng(0)
B, N, K = 1, 2048, 8
pts = np.stack([shapes.make_instance(rng, 0, n=N)]).astype(np.float32)
kp = pts[:, :K].copy()
fr = np.tile(np.eye(3, dtype=np.float32), (B, K, 1, 1))
fv = np.ones((B, K), bool)
nrm = np.zeros_like(pts); nrm[..., 2] = 1.0
mask = np.ones((B, N), bool)
args = tuple(map(jnp.asarray, (kp, fr, fv, pts, nrm, mask)))
for stage in (0, 1, 2, 3, 4):
    try:
        d, v = shot_descriptor_fused(*args, 0.6, stage=stage)
        np.asarray(jax.device_get(d))
        print(json.dumps({"stage": stage, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"stage": stage, "ok": False, "err": str(e)[:150]}), flush=True)
    print(f"[{time.perf_counter()-T0:6.1f}s] stage {stage}", file=sys.stderr, flush=True)
