"""Stage-level profiling of the encode path on the real TPU chip.

Times (a) the parallel rank precompute, (b) the Pallas encode kernel
with precomputed inputs, (c) the XLA v2 encoder for comparison, and
(d) the Pallas decode kernel — each synchronized, best-of-iters.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from redux_tpu import api, container
from redux_tpu.models.dense import prior_init_cum, quantize_prior
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters


def _sync(out):
    for a in jax.tree.leaves(out):
        np.asarray(jax.device_get(jnp.sum(jnp.ravel(a)[:1].astype(jnp.int32))))


def timeit(fn, iters=3):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import os

    corpora = ("calgary", "large") if "--full" in sys.argv else ("calgary",)
    data = b"".join(
        open(f"/root/reference/resources/{c}/{n}", "rb").read()
        for c in corpora
        for n in sorted(os.listdir(f"/root/reference/resources/{c}"))
    )
    n = len(data)
    params = Parameters.tpu_wide()
    block_size = container.DEFAULT_BLOCK_SIZE
    delta = container.DEFAULT_DELTA

    hist = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    budget = min(container.DEFAULT_PRIOR_BUDGET, params.freq_max // 2)
    extra = quantize_prior(hist, params, budget)[:256]
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[:256] = extra
    ic = prior_init_cum(full, params).astype(np.int32)

    syms_np, lens_np, n_blocks = api._split_blocks(data, block_size)
    k = block_size
    n_words = min(api._static_words(params, k, delta), k // 4 + 16)
    syms = jax.device_put(jnp.asarray(syms_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    icj = jax.device_put(jnp.asarray(ic))
    jax.block_until_ready((syms, lens, icj))
    print(f"n={n} bytes, n_blocks={n_blocks}, b_pad={syms.shape[0]}, k={k}", flush=True)

    t_rank, model = timeit(
        lambda: precompute_encode_model(syms, lens, icj, params.freq_max, delta=delta)
    )
    lo, hi, tot = model[0], model[1], model[2]
    print(f"rank precompute: {t_rank*1e3:.1f} ms  ({n/t_rank/1e9:.3f} GB/s)", flush=True)

    from redux_tpu.ops.pallas_encode import encode_blocks_pallas

    init_total = jnp.asarray(icj, jnp.int32)[-1]
    t_enc_pl, _ = timeit(
        lambda: encode_blocks_pallas(lo, hi, lens, init_total, params, n_words, delta)
    )
    print(f"pallas encode kernel: {t_enc_pl*1e3:.1f} ms  ({n/t_enc_pl/1e9:.3f} GB/s)", flush=True)

    def encode_step():
        lo2, hi2, tot2, _, _, _ = precompute_encode_model(
            syms, lens, icj, params.freq_max, delta=delta
        )
        return encode_blocks_pallas(lo2, hi2, lens, init_total, params, n_words, delta)

    t_comp, _ = timeit(encode_step)
    print(f"composite encode_step: {t_comp*1e3:.1f} ms  ({n/t_comp/1e9:.3f} GB/s)", flush=True)

    if "--xla" in sys.argv:
        from redux_tpu.ops.coder import encode_blocks_v2

        t_enc_xla, _ = timeit(lambda: encode_blocks_v2(lo, hi, tot, lens, params, n_words))
        print(f"xla encode_v2: {t_enc_xla*1e3:.1f} ms  ({n/t_enc_xla/1e9:.3f} GB/s)", flush=True)

    if "--bench" in sys.argv:
        from redux_tpu.bench import run_device_benchmark

        res = run_device_benchmark(data)
        print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in res.items()},
              flush=True)


if __name__ == "__main__":
    main()
