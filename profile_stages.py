"""Stage-by-stage profiling of the XLA codec path (dev tool).

NOTE (round 4): prefer scripts/kbench.py — it uses the slope-timing
methodology that survives the tunnel runtime's lazy sync and
identical-content dispatch caching (BASELINE.md post-mortem).  The
coarse timings here are indicative only.
"""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "")
import jax, jax.numpy as jnp, numpy as np
from redux_tpu import api
from redux_tpu.ops import coder
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.params import Parameters
from bench import load_corpus

def sync(*a):
    # block_until_ready ONLY: the old eager device_get pattern takes ~13 s
    # on the tunnel AND permanently degrades the runtime (BASELINE.md).
    jax.block_until_ready(a)

def run(params, block_size, iters=3):
    data = load_corpus()
    syms_np, lens_np, n_blocks = api._split_blocks(data, block_size)
    ic = api._init_cum(params, None)
    k = block_size
    n_words = api._static_words(params, k)
    syms = jax.device_put(jnp.asarray(syms_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    icj = jax.device_put(jnp.asarray(ic))
    sync(syms, lens, icj)
    print(f"params=({params.symbol_bits},{params.freq_bits},{params.code_bits}) "
          f"block={block_size} B={syms.shape[0]} K={k} n_words={n_words}", flush=True)

    pre = precompute_encode_model(syms, lens, icj, params.freq_max)
    sync(*pre)
    t0 = time.perf_counter()
    for _ in range(iters):
        pre = precompute_encode_model(syms, lens, icj, params.freq_max)
    sync(*pre)
    t_rank = (time.perf_counter() - t0) / iters

    enc = coder.encode_blocks_fast if params.fits_u32 else coder.encode_blocks
    out = enc(*pre, lens, params, n_words)
    words, byte_lens = out[0], out[1]
    sync(*out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc(*pre, lens, params, n_words)
    sync(*out)
    words, byte_lens = out[0], out[1]
    t_enc = (time.perf_counter() - t0) / iters
    if len(out) > 2:
        print(f"  ovf lanes: {int(np.asarray(out[2]).sum())}")

    dec = coder.decode_blocks(words, lens, icj, params, k)
    sync(dec)
    t0 = time.perf_counter()
    for _ in range(iters):
        dec = coder.decode_blocks(words, lens, icj, params, k)
    sync(dec)
    t_dec = (time.perf_counter() - t0) / iters

    n = len(data)
    print(f"  rank {t_rank*1e3:8.1f} ms ({n/t_rank/1e9:6.3f} GB/s)")
    print(f"  enc  {t_enc*1e3:8.1f} ms ({n/t_enc/1e9:6.3f} GB/s)")
    print(f"  dec  {t_dec*1e3:8.1f} ms ({n/t_dec/1e9:6.3f} GB/s)", flush=True)

if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    which = sys.argv[2] if len(sys.argv) > 2 else "tpu32"
    p = Parameters.tpu32() if which == "tpu32" else Parameters.default()
    run(p, bs)
