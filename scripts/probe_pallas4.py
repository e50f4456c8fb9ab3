"""Probe round 4: bisect which op makes the interval-math loop 1000x slow."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, T = 128, 4096
rng = np.random.default_rng(0)
z0 = rng.integers(1, 1 << 20, (1, L)).astype(np.uint32)


def bench(name, kernel, *args):
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        f(*args).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(*args)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:44s} {dt*1e3:8.2f} ms {dt/T*1e9:9.1f} ns/step")
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")


def loop(body):
    def kernel(z_ref, out_ref):
        out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)
    return kernel


M20 = 0xFFFFF


def b_mul(t, z):
    return (z * jnp.uint32(12345) + jnp.uint32(7)) & jnp.uint32(M20)


def b_clz(t, z):
    n = jax.lax.clz(z | jnp.uint32(1))
    return (z + n) & jnp.uint32(M20)


def b_shift_dyn(t, z):
    n = (z & jnp.uint32(15))
    return ((z << n) ^ (z >> (n & jnp.uint32(7)))) & jnp.uint32(M20)


def b_f32_div(t, z):
    a = z.astype(jnp.int32).astype(jnp.float32)
    d = ((z & jnp.uint32(1023)) | jnp.uint32(1)).astype(jnp.int32).astype(jnp.float32)
    q = jnp.floor(a / d).astype(jnp.int32)
    return (z + q.astype(jnp.uint32)) & jnp.uint32(M20)


def b_i32_fdiv(t, z):
    a = z.astype(jnp.int32)
    d = ((z & jnp.uint32(1023)) | jnp.uint32(1)).astype(jnp.int32)
    q = a // d
    return (z + q.astype(jnp.uint32)) & jnp.uint32(M20)


def b_u32_div(t, z):
    d = (z & jnp.uint32(1023)) | jnp.uint32(1)
    q = z // d
    return (z + q) & jnp.uint32(M20)


def b_i32_mod(t, z):
    a = z.astype(jnp.int32)
    d = ((z & jnp.uint32(1023)) | jnp.uint32(1)).astype(jnp.int32)
    q = a % d
    return (z + q.astype(jnp.uint32)) & jnp.uint32(M20)


def b_where(t, z):
    m = z > jnp.uint32(512)
    return jnp.where(m, z * jnp.uint32(3), z + jnp.uint32(5)) & jnp.uint32(M20)


def b_muldiv(t, z):
    import sys
    sys.path.insert(0, "/root/repo")
    from redux_tpu.ops import wide32
    a = (z | jnp.uint32(1 << 21)) & jnp.uint32(0x3FFFFF)
    b = z & jnp.uint32(M20)
    d = (z | jnp.uint32(1 << 19)) & jnp.uint32(M20)
    q = wide32.muldiv(a, b, d)
    return (z + q) & jnp.uint32(M20)


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench("u32 mul+add+and", loop(b_mul), z0)
    bench("clz", loop(b_clz), z0)
    bench("dynamic shifts", loop(b_shift_dyn), z0)
    bench("f32 divide + floor + casts", loop(b_f32_div), z0)
    bench("i32 floor-div //", loop(b_i32_fdiv), z0)
    bench("u32 div //", loop(b_u32_div), z0)
    bench("i32 mod %", loop(b_i32_mod), z0)
    bench("where/select", loop(b_where), z0)
    bench("wide32.muldiv full", loop(b_muldiv), z0)
