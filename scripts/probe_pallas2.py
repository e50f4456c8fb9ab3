"""Probe round 2: find a working per-lane dynamic selection primitive.

Round 1 found take_along_axis(axis=0) with per-lane indices SILENTLY
WRONG on v5 lite, and a (264,128) int16 reduce crashed Mosaic.  These
probes hunt for working alternatives — the decode kernel needs
``v[l] = words[idx[l], l]`` (per-lane stream refill) and a 258-row
model scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                out = fn()
                extra = f" {out}" if out else ""
                print(f"PASS {name}{extra}")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:140]
                print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return run
    return deco


def run_k(kernel, out_shape, *args, **kw):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        **kw,
    )(*args)


W, L = 64, 128
rng = np.random.default_rng(0)
w_i32 = np.arange(W * L, dtype=np.int32).reshape(W, L)
idx = rng.integers(0, W, (1, L)).astype(np.int32)
exp = w_i32[idx[0], np.arange(L)]


@probe("take_along_axis axis=0 int32 values")
def p_taa_i32():
    def kernel(w_ref, idx_ref, out_ref):
        out_ref[0, :] = jnp.take_along_axis(w_ref[:, :], idx_ref[:, :], axis=0)[0]
    out = run_k(kernel, jax.ShapeDtypeStruct((1, L), jnp.int32), w_i32, idx)
    assert np.array_equal(np.asarray(out)[0], exp), f"wrong: {np.asarray(out)[0][:8]} vs {exp[:8]}"


@probe("take_along_axis axis=0 idx broadcast to (W,L) then row0")
def p_taa_full():
    def kernel(w_ref, idx_ref, out_ref):
        idxf = jnp.broadcast_to(idx_ref[0, :][None, :], (W, L))
        out_ref[0, :] = jnp.take_along_axis(w_ref[:, :], idxf, axis=0)[0]
    out = run_k(kernel, jax.ShapeDtypeStruct((1, L), jnp.int32), w_i32, idx)
    assert np.array_equal(np.asarray(out)[0], exp)


@probe("onehot-select sum over W rows (where+sum)")
def p_onehot_sum():
    def kernel(w_ref, idx_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
        m = rows == idx_ref[0, :][None, :]
        out_ref[0, :] = jnp.sum(jnp.where(m, w_ref[:, :], 0), axis=0)
    out = run_k(kernel, jax.ShapeDtypeStruct((1, L), jnp.int32), w_i32, idx)
    assert np.array_equal(np.asarray(out)[0], exp)


@probe("take_along_axis along LANE axis (per-sublane idx)")
def p_taa_lane():
    wl = np.arange(8 * 512, dtype=np.int32).reshape(8, 512)
    il = rng.integers(0, 512, (8, 1)).astype(np.int32)
    def kernel(w_ref, idx_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(w_ref[:, :], idx_ref[:, :], axis=1)
    out = run_k(kernel, jax.ShapeDtypeStruct((8, 1), jnp.int32), wl, il)
    assert np.array_equal(np.asarray(out), np.take_along_axis(wl, il, axis=1))


@probe("cross-lane shuffle within (1,128) via take_along_axis axis=1")
def p_shuffle_lane():
    v = np.arange(128, dtype=np.int32).reshape(1, 128)
    perm = rng.permutation(128).astype(np.int32).reshape(1, 128)
    def kernel(v_ref, p_ref, out_ref):
        out_ref[:, :] = jnp.take_along_axis(v_ref[:, :], p_ref[:, :], axis=1)
    out = run_k(kernel, jax.ShapeDtypeStruct((1, 128), jnp.int32), v, perm)
    assert np.array_equal(np.asarray(out), np.take_along_axis(v, perm, axis=1))


@probe("onehot MXU gather from (128,) window f32")
def p_onehot_mxu():
    v = rng.integers(0, 1 << 16, (1, 128)).astype(np.float32)
    sel = rng.integers(0, 128, (1, 128)).astype(np.int32)
    def kernel(v_ref, s_ref, out_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        m = (cols == s_ref[0, :][:, None]).astype(jnp.float32)  # (out_lane, src)
        out_ref[:, :] = jax.lax.dot_general(
            m, v_ref[0, :][:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, 128)
    out = run_k(kernel, jax.ShapeDtypeStruct((1, 128), jnp.float32), v, sel)
    assert np.array_equal(np.asarray(out)[0], v[0][sel[0]])


@probe("dynamic per-lane row store via onehot where-merge (W rows)")
def p_onehot_store():
    def kernel(w_ref, idx_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
        m = rows == idx_ref[0, :][None, :]
        out_ref[:, :] = jnp.where(m, 777, w_ref[:, :])
    out = run_k(kernel, jax.ShapeDtypeStruct((W, L), jnp.int32), w_i32, idx)
    expw = w_i32.copy(); expw[idx[0], np.arange(L)] = 777
    assert np.array_equal(np.asarray(out), expw)


@probe("(272,128) int16 compare+sum")
def p_i16_272():
    S = 272
    cdf = np.sort(rng.integers(0, 32767, (S, 128)), axis=0).astype(np.int16)
    v = rng.integers(0, 32767, (1, 128)).astype(np.int16)
    def kernel(cdf_ref, v_ref, out_ref):
        b = cdf_ref[:, :] <= v_ref[0, :][None, :]
        out_ref[0, :] = jnp.sum(b.astype(jnp.int32), axis=0)
    out = run_k(kernel, jax.ShapeDtypeStruct((1, 128), jnp.int32), cdf, v)
    assert np.array_equal(np.asarray(out)[0], (cdf.astype(np.int32) <= v.astype(np.int32)).sum(0))


@probe("(264,128) int32 compare+sum+maskedminmax+update")
def p_i32_264():
    S = 264
    cdf = np.sort(rng.integers(0, 1 << 20, (S, 128)), axis=0).astype(np.int32)
    v = rng.integers(0, 1 << 20, (1, 128)).astype(np.int32)
    def kernel(cdf_ref, v_ref, out_ref):
        b = cdf_ref[:, :] <= v_ref[0, :][None, :]
        sym = jnp.sum(b.astype(jnp.int32), axis=0) - 1
        flo = jnp.max(jnp.where(b, cdf_ref[:, :], 0), axis=0)
        fhi = jnp.min(jnp.where(b, jnp.int32(1 << 20), cdf_ref[:, :]), axis=0)
        out_ref[0, :] = sym + flo + fhi
    out = run_k(kernel, jax.ShapeDtypeStruct((1, 128), jnp.int32), cdf, v)
    b = cdf.astype(np.int64) <= v.astype(np.int64)
    sym = b.sum(0) - 1
    flo = np.where(b, cdf, 0).max(0)
    fhi = np.where(b, 1 << 20, cdf).min(0)
    assert np.array_equal(np.asarray(out)[0], (sym + flo + fhi).astype(np.int32))


@probe("timing: decode-ish loop 4096 steps, 258-row i32 scan + u32 math")
def p_decode_speed():
    import time
    S = 264
    cdf0 = np.cumsum(np.ones((S, 128), np.int32), axis=0)
    z0 = rng.integers(0, 1 << 20, (1, 128)).astype(np.uint32)
    def kernel(cdf_ref, z_ref, out_ref, acc_ref):
        cdf_ref2 = acc_ref  # scratch alias for cdf state
        cdf_ref2[:, :] = cdf_ref[:, :]
        def body(t, z):
            cdf = cdf_ref2[:, :]
            count = cdf[S - 1, :][None, :]
            b = cdf <= z[0, :][None, :].astype(jnp.int32)
            sym = jnp.sum(b.astype(jnp.int32), axis=0)
            flo = jnp.max(jnp.where(b, cdf, 0), axis=0)
            fhi = jnp.min(jnp.where(b, jnp.int32(1 << 20), cdf), axis=0)
            cdf_ref2[:, :] = cdf + jnp.where(b, 0, 16)
            zz = (z[0, :] * flo.astype(jnp.uint32) + fhi.astype(jnp.uint32) + count[0].astype(jnp.uint32)) & jnp.uint32((1 << 20) - 1)
            return zz[None, :]
        z = jax.lax.fori_loop(0, 4096, body, z_ref[:, :])
        out_ref[:, :] = z.astype(jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.int32)],
    )
    f(cdf0, z0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        r = f(cdf0, z0)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    syms = 4096 * 128
    return f"{dt*1e3:.2f} ms for {syms} lane-symbols = {syms/dt/1e9:.3f} Gsym/s"


if __name__ == "__main__":
    print("devices:", jax.devices())
    for fn in [p_taa_i32, p_taa_full, p_onehot_sum, p_taa_lane, p_shuffle_lane,
               p_onehot_mxu, p_onehot_store, p_i16_272, p_i32_264, p_decode_speed]:
        fn()
