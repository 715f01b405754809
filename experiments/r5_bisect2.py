"""Bisect round 2: index-map arithmetic, dual outputs, and the full fused
SHOT kernel at small sizes."""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
T0 = time.perf_counter()


def try_case(name, fn):
    try:
        out = fn()
        jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), out)
        print(json.dumps({"case": name, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"case": name, "ok": False,
                          "err": str(e)[:200]}), flush=True)
    print(f"[{time.perf_counter() - T0:6.1f}s] {name}", file=sys.stderr,
          flush=True)


print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
x = jnp.asarray(np.random.default_rng(0).normal(
    size=(8, 4096)).astype(np.float32))   # 2 clouds x 2048


def case_divmod_indexmap():
    kpc, mt, tk = 24, 1, 8   # 24 kp-tiles per cloud

    def k(q_ref, p_ref, o_ref):
        o_ref[:] = jnp.sum(p_ref[:], axis=1, keepdims=True) + q_ref[:, 0:1]

    q = jnp.ones((48, 16), jnp.float32)    # 2 clouds x 24 tiles... 48 rows/8 = 6 tiles
    return pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((48, 1), jnp.float32),
        grid=(48 // tk, 1),
        in_specs=[
            pl.BlockSpec((tk, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2048), lambda i, j: (0, (i * tk // kpc) * mt + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tk, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
    )(q, x)


def case_dual_out():
    def k(p_ref, h_ref, c_ref):
        j = pl.program_id(1)
        v = jnp.sum(p_ref[:], axis=0)

        @pl.when(j == 0)
        def _():
            h_ref[:] = jnp.broadcast_to(v[:16][None, :], (256, 16))
            c_ref[:] = jnp.broadcast_to(v[:128][None, :], (8, 128))

        @pl.when(j != 0)
        def _():
            h_ref[:] = h_ref[:] + 1.0
            c_ref[:] = c_ref[:] + 1.0

    return pl.pallas_call(
        k,
        out_shape=(jax.ShapeDtypeStruct((512, 16), jnp.float32),
                   jax.ShapeDtypeStruct((16, 128), jnp.float32)),
        grid=(2, 2),
        in_specs=[pl.BlockSpec((8, 2048), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((256, 16), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
    )(x)


def case_full_small():
    import shapes
    from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
        shot_descriptor_fused)
    rng = np.random.default_rng(0)
    B, N, K = 1, 2048, 8
    pts = np.stack([shapes.make_instance(rng, 0, n=N)]).astype(np.float32)
    kp = pts[:, :K].copy()
    fr = np.tile(np.eye(3, dtype=np.float32), (B, K, 1, 1))
    fv = np.ones((B, K), bool)
    nrm = np.zeros_like(pts)
    nrm[..., 2] = 1.0
    mask = np.ones((B, N), bool)
    return shot_descriptor_fused(jnp.asarray(kp), jnp.asarray(fr),
                                 jnp.asarray(fv), jnp.asarray(pts),
                                 jnp.asarray(nrm), jnp.asarray(mask), 0.6)


try_case("divmod_indexmap", case_divmod_indexmap)
try_case("dual_out", case_dual_out)
try_case("full_small", case_full_small)
