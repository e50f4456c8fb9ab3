"""Probe round 5: bisect INSIDE wide32.muldiv — which composition is slow."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, T = 128, 4096
rng = np.random.default_rng(0)
z0 = rng.integers(1, 1 << 20, (1, L)).astype(np.uint32)
M20 = 0xFFFFF


def bench(name, body):
    def kernel(z_ref, out_ref):
        out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        f(z0).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(z0)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:52s} {dt*1e3:8.2f} ms {dt/T*1e9:9.1f} ns/step")
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:80]}")


def ops(z):
    a = (z | jnp.uint32(1 << 21)) & jnp.uint32(0x3FFFFF)
    b = z & jnp.uint32(M20)
    d = (z | jnp.uint32(1 << 19)) & jnp.uint32(M20)
    return a, b, d


def b1_mulsplit(t, z):
    a, b, d = ops(z)
    hi = (a >> 11) * b
    lo = (a & jnp.uint32(2047)) * b
    return (z + hi + lo) & jnp.uint32(M20)


def b2_f32est(t, z):
    a, b, d = ops(z)
    hi = (a >> 11) * b
    lo = (a & jnp.uint32(2047)) * b
    df = d.astype(jnp.int32).astype(jnp.float32)
    xf = hi.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2048.0) + lo.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(xf / df).astype(jnp.int32).astype(jnp.uint32)
    return (z + q) & jnp.uint32(M20)


def b3_rem(t, z):
    a, b, d = ops(z)
    hi = (a >> 11) * b
    lo = (a & jnp.uint32(2047)) * b
    df = d.astype(jnp.int32).astype(jnp.float32)
    xf = hi.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2048.0) + lo.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(xf / df).astype(jnp.int32).astype(jnp.uint32)
    x32 = (hi << 11) + lo
    r = (x32 - q * d).astype(jnp.int32)
    return (z + q + r.astype(jnp.uint32)) & jnp.uint32(M20)


def b4_full(t, z):
    a, b, d = ops(z)
    hi = (a >> 11) * b
    lo = (a & jnp.uint32(2047)) * b
    df = d.astype(jnp.int32).astype(jnp.float32)
    xf = hi.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2048.0) + lo.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(xf / df).astype(jnp.int32).astype(jnp.uint32)
    x32 = (hi << 11) + lo
    di = d.astype(jnp.int32)
    r = (x32 - q * d).astype(jnp.int32)
    q = q + (r // di).astype(jnp.uint32)
    return (z + q) & jnp.uint32(M20)


def b5_wherefix(t, z):
    a, b, d = ops(z)
    hi = (a >> 11) * b
    lo = (a & jnp.uint32(2047)) * b
    df = d.astype(jnp.int32).astype(jnp.float32)
    xf = hi.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2048.0) + lo.astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(xf / df).astype(jnp.int32).astype(jnp.uint32)
    x32 = (hi << 11) + lo
    di = d.astype(jnp.int32)
    r = (x32 - q * d).astype(jnp.int32)
    for _ in range(2):
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + di, r)
    for _ in range(2):
        over = r >= di
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - di, r)
    return (z + q) & jnp.uint32(M20)


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench("1 mul_split only", b1_mulsplit)
    bench("2 + f32 estimate", b2_f32est)
    bench("3 + wraparound remainder", b3_rem)
    bench("4 + i32 // fixup (full muldiv)", b4_full)
    bench("5 where-fixup instead of //", b5_wherefix)
