"""Probe round 3: where do the cycles go in a decode-shaped Pallas loop?

Round 2 measured the full dense-model decode body at 0.057 Gsym/s
(~17 cycles/lane-symbol at 128 lanes) — ~10x over the op-count estimate.
These probes time individual pieces to find the overhead.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, T = 264, 128, 4096
rng = np.random.default_rng(0)
cdf0 = np.cumsum(np.ones((S, L), np.int32), axis=0)
z0 = rng.integers(0, 1 << 20, (1, L)).astype(np.uint32)
z8 = rng.integers(0, 1 << 20, (8, L)).astype(np.uint32)


def bench(name, f, *args, iters=T, lanes=L):
    f(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    syms = iters * lanes
    print(f"{name:50s} {dt*1e3:8.2f} ms  {syms/dt/1e9:7.3f} Gsym/s  {dt/iters*1e9:8.1f} ns/step")


def mk(kernel, n_in, out_shape, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )


# 1. empty-ish loop: (1,L) u32 arithmetic only — measures loop overhead.
def k_loop_only(z_ref, out_ref):
    def body(t, z):
        return (z * jnp.uint32(123) + jnp.uint32(7)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 2. interval-math-shaped loop on (1,L): ~50 u32/f32 ops incl. 2 wide divides.
def k_interval(z_ref, out_ref):
    import sys
    sys.path.insert(0, "/root/repo")
    from redux_tpu.ops import wide32

    def body(t, carry):
        low, high, z = carry
        rngv = high - low + 1
        q = wide32.muldiv(rngv, z & jnp.uint32(0xFFFFF), (z | jnp.uint32(1)) & jnp.uint32(0x3FFFFF) | jnp.uint32(1 << 20))
        low = (low + q) & jnp.uint32(0x3FFFFF)
        high = (high ^ q) | jnp.uint32(1 << 21)
        n1 = jax.lax.clz(low ^ high).astype(jnp.int32) - 10
        low = jnp.where(n1 > 0, (low << 1) & jnp.uint32(0x3FFFFF), low)
        z = (z * jnp.uint32(5) + q) & jnp.uint32(0xFFFFF)
        return low, high, z
    low = jnp.zeros((1, L), jnp.uint32)
    high = jnp.full((1, L), (1 << 22) - 1, jnp.uint32)
    _, _, z = jax.lax.fori_loop(0, T, body, (low, high, z_ref[:, :]))
    out_ref[:, :] = z.astype(jnp.int32)


# 3. update-only pass over (S,L) in scratch: compare + where + add.
def k_update_only(cdf_ref, z_ref, out_ref, cdf_s):
    cdf_s[:, :] = cdf_ref[:, :]
    def body(t, z):
        cdf = cdf_s[:, :]
        b = cdf <= z[0, :][None, :].astype(jnp.int32)
        cdf_s[:, :] = cdf + jnp.where(b, 0, 16)
        return (z * jnp.uint32(17) + jnp.uint32(3)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 4. sum-reduction-only: compare + sum(axis=0) per step, no update.
def k_sum_only(cdf_ref, z_ref, out_ref):
    def body(t, z):
        b = cdf_ref[:, :] <= z[0, :][None, :].astype(jnp.int32)
        sym = jnp.sum(b.astype(jnp.int32), axis=0)
        return (z + sym.astype(jnp.uint32)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 5. sum via reshape (33,8,L) then sum twice (tile-friendly tree).
def k_sum_reshape(cdf_ref, z_ref, out_ref):
    def body(t, z):
        b = (cdf_ref[:, :] <= z[0, :][None, :].astype(jnp.int32)).astype(jnp.int32)
        part = jnp.sum(b.reshape(33, 8, L), axis=0)  # (8, L)
        sym = jnp.sum(part, axis=0)  # (L,)
        return (z + sym.astype(jnp.uint32)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 6. max+min masked extraction only.
def k_minmax_only(cdf_ref, z_ref, out_ref):
    def body(t, z):
        cdf = cdf_ref[:, :]
        b = cdf <= z[0, :][None, :].astype(jnp.int32)
        flo = jnp.max(jnp.where(b, cdf, 0), axis=0)
        fhi = jnp.min(jnp.where(b, jnp.int32(1 << 20), cdf), axis=0)
        return (z + flo.astype(jnp.uint32) + fhi.astype(jnp.uint32)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 7. flo/fhi via dot-free "select row sym" using onehot-sum (2 passes).
def k_onehot_extract(cdf_ref, z_ref, out_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
    def body(t, z):
        cdf = cdf_ref[:, :]
        b = cdf <= z[0, :][None, :].astype(jnp.int32)
        sym = jnp.sum(b.astype(jnp.int32), axis=0) - 1
        m1 = rows == sym[None, :]
        flo = jnp.sum(jnp.where(m1, cdf, 0), axis=0)
        m2 = rows == (sym + 1)[None, :]
        fhi = jnp.sum(jnp.where(m2, cdf, 0), axis=0)
        return (z + flo.astype(jnp.uint32) + fhi.astype(jnp.uint32)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T, body, z_ref[:, :]).astype(jnp.int32)


# 8. 8-symbols-per-iteration batch: one pass computes 8 compare columns?
#    (amortizes load of cdf over 8 z values — valid only without update,
#    measures whether VMEM loads dominate)
def k_sum_batch8(cdf_ref, z_ref, out_ref):
    def body(t, z8v):
        cdf = cdf_ref[:, :]
        acc = jnp.zeros((8, L), jnp.int32)
        for i in range(8):
            b = cdf <= z8v[i, :][None, :].astype(jnp.int32)
            acc = acc.at[i, :].set(jnp.sum(b.astype(jnp.int32), axis=0))
        return (z8v + acc.astype(jnp.uint32)) & jnp.uint32(0xFFFFF)
    out_ref[:, :] = jax.lax.fori_loop(0, T // 8, body, z_ref[:, :]).astype(jnp.int32)


# 9. interval math on (8,L) lanes (encode-shaped, 1024 lanes).
def k_interval8(z_ref, out_ref):
    import sys
    sys.path.insert(0, "/root/repo")
    from redux_tpu.ops import wide32

    def body(t, carry):
        low, high, z = carry
        rngv = high - low + 1
        q = wide32.muldiv(rngv, z & jnp.uint32(0xFFFFF), (z | jnp.uint32(1)) & jnp.uint32(0x3FFFFF) | jnp.uint32(1 << 20))
        low = (low + q) & jnp.uint32(0x3FFFFF)
        high = (high ^ q) | jnp.uint32(1 << 21)
        n1 = jax.lax.clz(low ^ high).astype(jnp.int32) - 10
        low = jnp.where(n1 > 0, (low << 1) & jnp.uint32(0x3FFFFF), low)
        z = (z * jnp.uint32(5) + q) & jnp.uint32(0xFFFFF)
        return low, high, z
    low = jnp.zeros((8, L), jnp.uint32)
    high = jnp.full((8, L), (1 << 22) - 1, jnp.uint32)
    _, _, z = jax.lax.fori_loop(0, T, body, (low, high, z_ref[:, :]))
    out_ref[:, :] = z.astype(jnp.int32)


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench("1 loop-only (1,128) 3 ops", mk(k_loop_only, 1, jax.ShapeDtypeStruct((1, L), jnp.int32)), z0)
    bench("2 interval wide math (1,128)", mk(k_interval, 1, jax.ShapeDtypeStruct((1, L), jnp.int32)), z0)
    bench("3 update-only (264,128) i32", mk(k_update_only, 2, jax.ShapeDtypeStruct((1, L), jnp.int32), scratch=[pltpu.VMEM((S, L), jnp.int32)]), cdf0, z0)
    bench("4 compare+sum only", mk(k_sum_only, 2, jax.ShapeDtypeStruct((1, L), jnp.int32)), cdf0, z0)
    bench("5 compare+sum via (33,8,L) reshape", mk(k_sum_reshape, 2, jax.ShapeDtypeStruct((1, L), jnp.int32)), cdf0, z0)
    bench("6 masked max+min only", mk(k_minmax_only, 2, jax.ShapeDtypeStruct((1, L), jnp.int32)), cdf0, z0)
    bench("7 sum + onehot flo/fhi", mk(k_onehot_extract, 2, jax.ShapeDtypeStruct((1, L), jnp.int32)), cdf0, z0)
    bench("8 compare+sum batch x8 (8,128) z", mk(k_sum_batch8, 2, jax.ShapeDtypeStruct((8, L), jnp.int32)), z8, iters=T, lanes=L)
    bench("9 interval wide math (8,128) lanes", mk(k_interval8, 1, jax.ShapeDtypeStruct((8, L), jnp.int32)), z8, iters=T, lanes=8 * L)
