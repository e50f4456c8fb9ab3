"""Kernel micro-benchmark: encode/decode Pallas kernels device-resident.

Usage: python scripts/kbench.py [--blocks N] [--bs BYTES] [--iters N]
Times ONLY the kernel entry points (model-in-kernel encode, transposed
decode) on real corpus bytes, skipping the api/container host path, so
kernel changes can be A/B'd in seconds.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from redux_tpu import api, container
from redux_tpu.models.dense import prior_init_cum, quantize_prior
from redux_tpu.params import Parameters

RES = "/root/reference/resources"


def load_corpus(n: int) -> bytes:
    parts = []
    for c in ("calgary", "large"):
        d = os.path.join(RES, c)
        for name in sorted(os.listdir(d)):
            with open(os.path.join(d, name), "rb") as f:
                parts.append(f.read())
    data = b"".join(parts)
    while len(data) < n:
        data += data
    return data[:n]


def sync(*arrays):
    for a in arrays:
        jax.block_until_ready(a)


def timed_slope(step, fetch, n_lo=3, n_hi=10, repeats=3):
    """Honest per-iteration time on the axon runtime (see
    redux_tpu.bench._timed_slope): fresh device-side content per
    iteration, a small end fetch to drain the queue, and the slope of
    two run lengths so constant overheads cancel.  block_until_ready
    alone can return BEFORE queued executions run here, and identical
    content can be served without re-execution."""
    import time as _t

    slopes = []
    salt = 1
    for _ in range(repeats):
        runs = []
        for n in (n_lo, n_hi):
            t0 = _t.perf_counter()
            out = None
            for _ in range(n):
                out = step(salt)
                salt += 1
            fetch(out)
            runs.append(_t.perf_counter() - t0)
        slopes.append((runs[1] - runs[0]) / (n_hi - n_lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=0, help="0 = api auto block size")
    ap.add_argument("--blocks", type=int, default=0, help="0 = whole corpus")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--delta", type=int, default=container.DEFAULT_DELTA)
    ap.add_argument("--profile", default="", help="jax.profiler trace dir")
    ap.add_argument("--enc-only", action="store_true")
    ap.add_argument("--dec-only", action="store_true")
    ap.add_argument("--mkernel", action="store_true",
                    help="time the model-in-kernel encoder instead of ranked")
    ap.add_argument("--ranks", action="store_true",
                    help="time the rank precompute + streaming encode kernel")
    args = ap.parse_args()

    params = Parameters.tpu_wide()
    k = args.bs or container.DEFAULT_BLOCK_SIZE
    n = args.blocks * k if args.blocks else 9786796
    data = load_corpus(n)
    if not args.bs:
        k = api._auto_block_size(len(data))
    print(f"corpus {len(data)} bytes, block {k}, backend {jax.default_backend()}",
          file=sys.stderr)

    hist = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    budget = min(container.DEFAULT_PRIOR_BUDGET, params.freq_max // 2)
    extra = quantize_prior(hist, params, budget)[:256]
    full = np.zeros(params.symbol_count, dtype=np.int64)
    full[:256] = extra
    ic = prior_init_cum(full, params).astype(np.int32)

    syms_np, lens_np, n_blocks = api._split_blocks(data, k)
    n_words = min(api._static_words(params, k, args.delta), k // 4 + 16)
    syms = jax.device_put(jnp.asarray(syms_np))
    lens = jax.device_put(jnp.asarray(lens_np))
    icj = jax.device_put(jnp.asarray(ic))
    sync(syms, lens, icj)
    mut_syms = jax.jit(
        lambda x, i: ((x.astype(jnp.int32) + i) & 255).astype(jnp.uint8)
    )
    print(f"n_blocks={n_blocks} lanes={syms_np.shape[0]} n_words={n_words}",
          file=sys.stderr)

    from redux_tpu.ops.pallas_decode import (
        decode_blocks_pallas_t, init_cum_column, pad_geometry,
    )
    from redux_tpu.ops.pallas_encode import encode_blocks_pallas_m

    if args.ranks:
        from redux_tpu.ops.pallas_encode import encode_blocks_pallas
        from redux_tpu.ops.ranks import precompute_encode_model

        def rank_step():
            return precompute_encode_model(
                syms, lens, icj, params.freq_max, delta=args.delta
            )[:3]

        pre = rank_step()
        sync(*pre)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pre = rank_step()
        sync(*pre)
        t_rank = (time.perf_counter() - t0) / args.iters
        print(f"ranks: {t_rank*1e3:.1f} ms  {len(data)/t_rank/1e9:.3f} GB/s")
        lo, hi, tot = pre

        init_total = jnp.asarray(ic, jnp.int32)[-1]

        def enc2_step():
            return encode_blocks_pallas(lo, hi, lens, init_total, params,
                                        n_words, args.delta)

        w2 = enc2_step()
        sync(*w2)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            w2 = enc2_step()
        sync(*w2)
        t_e2 = (time.perf_counter() - t0) / args.iters
        print(f"stream-encode: {t_e2*1e3:.1f} ms  {len(data)/t_e2/1e9:.3f} GB/s")
        print(f"ranks+stream total: {len(data)/(t_rank+t_e2)/1e9:.3f} GB/s")
        # differential: must be bit-identical to the model-in-kernel path
        wm, blm, ovfm = encode_blocks_pallas_m(syms, lens, icj, params, n_words,
                                               args.delta)
        ws, bls, ovfs = w2
        blm_n = np.asarray(blm)[:n_blocks]
        bls_n = np.asarray(bls)[:n_blocks]
        lens_ok = bool((blm_n == bls_n).all())
        wm_n, ws_n = np.asarray(wm)[:n_blocks], np.asarray(ws)[:n_blocks]
        # Words past each lane's byte length are unspecified (stale slab
        # content differs between paths) — mask them out.
        wmask = (
            np.arange(wm_n.shape[1])[None, :] < ((blm_n[:, None] + 3) // 4)
        )
        words_ok = bool((np.where(wmask, wm_n, 0) == np.where(wmask, ws_n, 0)).all())
        print(f"ranks-path vs m-kernel: lens_ok={lens_ok} words_ok={words_ok}")
        if not (lens_ok and words_ok):
            bad = np.nonzero(blm_n != bls_n)[0] if not lens_ok else np.nonzero(
                (np.where(wmask, wm_n, 0) != np.where(wmask, ws_n, 0)).any(axis=1)
            )[0]
            print(f"first differing lanes: {bad[:5]}  lens m/s: "
                  f"{blm_n[bad[:5]]} {bls_n[bad[:5]]}")

    from redux_tpu.ops.pallas_encode import encode_blocks_ranked

    if args.mkernel:
        def encode_step(i=0):
            return encode_blocks_pallas_m(
                mut_syms(syms, i), lens, icj, params, n_words, args.delta)
    else:
        def encode_step(i=0):
            return encode_blocks_ranked(
                mut_syms(syms, i), lens, icj, params, n_words, args.delta)

    t0 = time.perf_counter()
    words, byte_lens, ovf = encode_step()
    _ = np.asarray(byte_lens).ravel()[:1]
    print(f"encode compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t_enc = timed_slope(encode_step, lambda o: np.asarray(o[1]).ravel()[:1])
    enc_gbps = len(data) / t_enc / 1e9
    comp = int(np.asarray(byte_lens)[:n_blocks].sum()) + 32 + 4 * n_blocks + 512
    print(f"encode: {t_enc*1e3:.1f} ms  {enc_gbps:.3f} GB/s  ratio {len(data)/comp:.4f}")
    if args.profile and not args.dec_only:
        with jax.profiler.trace(args.profile + "/enc"):
            w2 = encode_step()
            sync(*w2)

    if args.enc_only:
        return

    bl_np = np.asarray(byte_lens)[:n_blocks]
    w_np = np.asarray(words)[:n_blocks]
    blk_bytes = np.minimum(k, len(data) - k * np.arange(n_blocks))
    raw = np.asarray(ovf)[:n_blocks].astype(bool) | (bl_np >= blk_bytes)
    if raw.any():
        print(f"raw blocks: {int(raw.sum())}", file=sys.stderr)
    bl_np = np.where(raw, 0, bl_np)
    wcap = max(4, int(-(-bl_np.max() // 4)) + 2)
    wn_pad, bp = pad_geometry(wcap, n_blocks)
    order = np.argsort(bl_np, kind="stable")
    words_t = np.zeros((wn_pad, bp), dtype=np.uint32)
    lens_row = np.zeros((1, bp), dtype=np.int32)
    lanes = np.flatnonzero(~raw[order])
    src = order[lanes]
    nwi = ((bl_np[src] + 3) // 4).astype(np.int64)
    wn_cp = min(wn_pad, w_np.shape[1])
    words_t[:wn_cp, lanes] = np.where(
        np.arange(wn_cp, dtype=np.int64)[:, None] < nwi[None, :],
        w_np[src, :wn_cp].T, 0,
    )
    lens_row[0, lanes] = lens_np[src]
    wn_mut = wn_pad + 128  # mutation row far past every lane's read-ahead
    words_t = np.pad(words_t, ((0, 128), (0, 0)))
    wt = jax.device_put(jnp.asarray(words_t))
    lr = jax.device_put(jnp.asarray(lens_row))
    icol = jax.device_put(jnp.asarray(init_cum_column(ic, params)))
    sync(wt, lr, icol)
    mut_words = jax.jit(lambda x, i: x.at[wn_mut - 1, :].set(jnp.uint32(i)))

    def decode_step(i=0):
        return decode_blocks_pallas_t(mut_words(wt, i), lr, icol, params, k,
                                      args.delta)

    t0 = time.perf_counter()
    out = decode_step()
    _ = np.asarray(out[0:1, 0:1])
    print(f"decode compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t_dec = timed_slope(decode_step, lambda o: np.asarray(o[0:1, 0:1]))
    out = decode_step()  # salt 0: true content for the roundtrip check
    sync(out)
    dec_gbps = len(data) / t_dec / 1e9
    print(f"decode: {t_dec*1e3:.1f} ms  {dec_gbps:.3f} GB/s")
    print(f"aggregate: {2*len(data)/(t_enc+t_dec)/1e9:.3f} GB/s")
    if args.profile:
        with jax.profiler.trace(args.profile + "/dec"):
            o2 = decode_step()
            sync(o2)

    # quick correctness spot check (raw blocks spliced from the source)
    dec_np = np.asarray(out)
    got = np.zeros((n_blocks, k), dtype=np.uint8)
    for lane, i in enumerate(order):
        if raw[i]:
            got[i, : blk_bytes[i]] = np.frombuffer(
                data[i * k : i * k + blk_bytes[i]], np.uint8
            )
        else:
            got[i] = dec_np[:k, lane]
    ok = got.reshape(-1)[: len(data)].tobytes() == data
    print(f"roundtrip ok: {ok}")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
