"""Probe Mosaic/Pallas TPU support for the ops the codec kernels need.

Each probe compiles+runs a tiny kernel on the real chip and reports
ok/fail — the results decide the decode-kernel design (gather-based vs
select-based stream reads, u32 div strategy, int16 model rows).
"""

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"PASS {name}")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return run
    return deco


@probe("take_along_axis sublane gather (per-lane row index)")
def p_gather():
    W, L = 64, 128

    def kernel(w_ref, idx_ref, out_ref):
        idx = idx_ref[0, :]
        out_ref[0, :] = jnp.take_along_axis(w_ref[:, :], idx[None, :], axis=0)[0]

    w = np.arange(W * L, dtype=np.uint32).reshape(W, L)
    idx = np.random.default_rng(0).integers(0, W, (1, L)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(w, idx)
    exp = w[idx[0], np.arange(L)]
    assert np.array_equal(np.asarray(out)[0], exp), "wrong values"


@probe("uint32 divide")
def p_udiv():
    L = 128

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:, :] = a_ref[:, :] // b_ref[:, :]

    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 32, (8, L), dtype=np.uint32)
    b = rng.integers(1, 1 << 17, (8, L), dtype=np.uint32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    assert np.array_equal(np.asarray(out), a // b), "wrong quotient"


@probe("uint32 full multiply low bits")
def p_umul():
    L = 128

    def kernel(a_ref, b_ref, out_ref):
        out_ref[:, :] = a_ref[:, :] * b_ref[:, :]

    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 17, (8, L), dtype=np.uint32)
    b = rng.integers(0, 1 << 15, (8, L), dtype=np.uint32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    assert np.array_equal(np.asarray(out), a * b), "wrong product"


@probe("clz uint32")
def p_clz():
    L = 128

    def kernel(a_ref, out_ref):
        out_ref[:, :] = jax.lax.clz(a_ref[:, :]).astype(jnp.int32)

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 32, (8, L), dtype=np.uint32)
    a[0, 0] = 0
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
    exp = np.array([[32 - int(x).bit_length() for x in row] for row in a])
    assert np.array_equal(np.asarray(out), exp), "wrong clz"


@probe("int16 compare+select+sum over 264 rows")
def p_i16():
    S, L = 264, 128

    def kernel(cdf_ref, v_ref, out_ref):
        b = cdf_ref[:, :] <= v_ref[0, :][None, :]
        out_ref[0, :] = jnp.sum(b.astype(jnp.int32), axis=0)

    rng = np.random.default_rng(4)
    cdf = np.sort(rng.integers(0, 32767, (S, L)), axis=0).astype(np.int16)
    v = rng.integers(0, 32767, (1, L)).astype(np.int16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cdf, v)
    exp = (cdf.astype(np.int32) <= v.astype(np.int32)).sum(axis=0)
    assert np.array_equal(np.asarray(out)[0], exp), "wrong i16 rank"


@probe("dynamic row store out_ref[pl.ds(t,1),:] in fori loop")
def p_dynstore():
    K, L = 64, 128

    def kernel(x_ref, out_ref):
        def body(t, _):
            out_ref[pl.ds(t, 1), :] = x_ref[pl.ds(t, 1), :] + t
            return 0
        jax.lax.fori_loop(0, K, body, 0)

    x = np.zeros((K, L), np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    exp = np.broadcast_to(np.arange(K, dtype=np.int32)[:, None], (K, L))
    assert np.array_equal(np.asarray(out), exp), "wrong dynamic store"


@probe("uint8 output dtype")
def p_u8out():
    def kernel(x_ref, out_ref):
        out_ref[:, :] = x_ref[:, :].astype(jnp.uint8)

    x = np.arange(32 * 128, dtype=np.int32).reshape(32, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert np.array_equal(np.asarray(out), (x % 256).astype(np.uint8))


@probe("gather timing: 4096 take_along_axis rounds")
def p_gather_speed():
    import time
    W, L = 2048, 256

    def kernel(w_ref, idx_ref, out_ref):
        def body(t, acc):
            idx = (idx_ref[0, :] + t) % W
            g = jnp.take_along_axis(w_ref[:, :], idx[None, :], axis=0)[0]
            return acc + g
        out_ref[0, :] = jax.lax.fori_loop(0, 4096, body, jnp.zeros((L,), jnp.uint32))

    w = np.arange(W * L, dtype=np.uint32).reshape(W, L)
    idx = np.random.default_rng(0).integers(0, W, (1, L)).astype(np.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, L), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f(w, idx).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(w, idx)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"  gather loop: {dt*1e6:.0f} us for 4096 gathers of (1,{L}) = {dt/4096*1e9:.1f} ns/gather")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for fn in [p_gather, p_udiv, p_umul, p_clz, p_i16, p_dynstore, p_u8out, p_gather_speed]:
        fn()
