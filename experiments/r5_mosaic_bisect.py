"""Bisect which construct of the fused SHOT kernel crashes the axon
remote compiler (HTTP 500 with no Mosaic diagnostic)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def try_case(name, fn):
    try:
        out = fn()
        np.asarray(jax.device_get(out))
        print(json.dumps({"case": name, "ok": True}), flush=True)
    except Exception as e:
        print(json.dumps({"case": name, "ok": False,
                          "err": str(e)[:200]}), flush=True)
    print(f"[{time.perf_counter() - T0:6.1f}s] {name}", file=sys.stderr,
          flush=True)


x8 = jnp.asarray(np.random.default_rng(0).normal(
    size=(8, 2048)).astype(np.float32))
k16 = jnp.asarray(np.random.default_rng(1).normal(
    size=(16, 16)).astype(np.float32))


def case_repeat():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 32, 0)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (256, 2048), jnp.float32))(x8)


def case_shift_mod():
    def k(x_ref, o_ref):
        i = jnp.floor(x_ref[:]).astype(jnp.int32)
        v = ((i << 3) + (i << 2)) << 1
        o_ref[:] = ((v % 32).astype(jnp.float32))
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (8, 2048), jnp.float32))(x8)


def case_bf16_dot():
    def k(x_ref, o_ref):
        a = pltpu.repeat(x_ref[:], 32, 0).astype(jnp.bfloat16)  # [256, 2048]
        b = pltpu.repeat(x_ref[:], 16, 0).astype(jnp.bfloat16)  # [128, 2048]
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (256, 128), jnp.float32))(x8)


def case_iota_onehot():
    def k(x_ref, o_ref):
        i = jnp.floor(x_ref[:] * 3.0).astype(jnp.int32)
        rep = pltpu.repeat(i, 32, 0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 2048), 0) // 8
        o_ref[:] = (rep == iota).astype(jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (256, 2048), jnp.float32))(x8)


def case_narrow_out():
    def k(x_ref, o_ref):
        s = jnp.sum(x_ref[:], axis=1)  # [8]
        o_ref[:] = jnp.broadcast_to(s[:, None], (8, 16))
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (8, 16), jnp.float32))(x8)


def case_narrow_kref():
    def k(k_ref, o_ref):
        o_ref[:] = k_ref[:, 0:1] + k_ref[:, 9:10]
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (16, 1), jnp.float32))(k16)


def case_group_matmul():
    def k(x_ref, o_ref):
        acc = jax.lax.dot_general(
            pltpu.repeat(x_ref[:], 32, 0).astype(jnp.bfloat16),
            pltpu.repeat(x_ref[:], 16, 0).astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0) % 8
        col_k = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1) % 8
        masked = jnp.where(row_k == col_k, acc, 0.0)
        group = (jax.lax.broadcasted_iota(jnp.int32, (128, 16), 0) // 8
                 == jax.lax.broadcasted_iota(jnp.int32, (128, 16), 1)
                 ).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(masked, group,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (256, 16), jnp.float32))(x8)


def case_atan_poly():
    def k(x_ref, o_ref):
        sys.path.insert(0, ".")
        from point_cloud_donkey_tpu.ops.pallas.shot_fused import _atan2
        o_ref[:] = _atan2(x_ref[:], x_ref[:] + 0.5)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(
        (8, 2048), jnp.float32))(x8)


print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
try_case("repeat", case_repeat)
try_case("shift_mod", case_shift_mod)
try_case("bf16_dot", case_bf16_dot)
try_case("iota_onehot", case_iota_onehot)
try_case("narrow_out", case_narrow_out)
try_case("narrow_kref", case_narrow_kref)
try_case("group_matmul", case_group_matmul)
try_case("atan_poly", case_atan_poly)
