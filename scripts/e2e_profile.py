"""End-to-end api.encode/api.decode stage profile on the current backend.

Prints per-stage wall times (the _timings hook in redux_tpu.api) so the
host-path share of e2e time is visible next to the device kernels.

Run on TPU:  python scripts/e2e_profile.py [--bs N] [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kbench import load_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=0, help="0 = container default")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bytes", type=int, default=9786796)
    args = ap.parse_args()

    from redux_tpu import api, container

    bs = args.bs or container.DEFAULT_BLOCK_SIZE
    data = load_corpus(args.bytes)
    import jax

    print(f"backend={jax.default_backend()} bytes={len(data)} block={bs}",
          file=sys.stderr)

    # warm (compile)
    arc = api.encode(data, block_size=bs)
    assert api.decode(arc) == data

    enc_t: dict = {}
    t0 = time.perf_counter()
    for _ in range(args.iters):
        arc = api.encode(data, block_size=bs, _timings=enc_t)
    t_enc = (time.perf_counter() - t0) / args.iters
    dec_t: dict = {}
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = api.decode(arc, _timings=dec_t)
    t_dec = (time.perf_counter() - t0) / args.iters
    assert out == data

    n = args.iters
    print(f"e2e encode {t_enc*1e3:.0f} ms ({len(data)/t_enc/1e9:.4f} GB/s): "
          + "  ".join(f"{k}={v/n*1e3:.0f}ms" for k, v in enc_t.items()))
    print(f"e2e decode {t_dec*1e3:.0f} ms ({len(data)/t_dec/1e9:.4f} GB/s): "
          + "  ".join(f"{k}={v/n*1e3:.0f}ms" for k, v in dec_t.items()))


if __name__ == "__main__":
    main()
