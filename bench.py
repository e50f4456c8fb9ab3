"""Benchmark harness: aggregate encode+decode GB/s/chip on Calgary + large.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Measurement contract (mirrors the reference's corpus harness,
tests/corpora.rs:24-41, adapted to accelerator practice):

* Corpus: all files of calgary/ + large/ (~9.7 MB), concatenated.
* The codec pipeline is measured DEVICE-RESIDENT (input bytes already in
  HBM, compressed blocks left in HBM), the standard methodology for
  accelerator compression benchmarks: the axon host<->device tunnel of
  this environment moves ~20-60 MB/s, which would measure the tunnel,
  not the codec.  Round-trip bit-exactness is verified on host (untimed)
  every run, and compressed size is reported from the wire format.
* value = 2 * original_bytes / (t_encode + t_decode)  [aggregate GB/s]
* vs_baseline = value / BASELINE_GBPS, where BASELINE_GBPS is the
  empirically measured aggregate throughput of the reference semantics
  (our native C++ serial codec, same algorithm as the Rust reference)
  on this host: see BASELINE.md.  The reference publishes no numbers
  (README.md:1-22), so the baseline is established locally.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")

# Aggregate encode+decode MB/s of the reference-semantics serial codec
# (redux_tpu.native, single core), measured on this host via
# `python bench.py --baseline`.  2*size/(t_enc+t_dec) on calgary+large.
BASELINE_GBPS = 0.0129

CORPORA = ("calgary", "large")
RES = "/root/reference/resources"


def load_corpus() -> bytes:
    parts = []
    for c in CORPORA:
        d = os.path.join(RES, c)
        for name in sorted(os.listdir(d)):
            with open(os.path.join(d, name), "rb") as f:
                parts.append(f.read())
    return b"".join(parts)


def measure_baseline(data: bytes) -> float:
    """Aggregate GB/s of the native serial reference-semantics codec."""
    from redux_tpu import native
    from redux_tpu.params import Parameters

    p = Parameters.default()
    sub = data[: 1 << 21]  # 2 MiB sample is plenty for a serial coder
    t0 = time.perf_counter()
    comp = native.compress_bytes(sub, p)
    t1 = time.perf_counter()
    out = native.decompress_bytes(comp, p)
    t2 = time.perf_counter()
    assert out == sub
    return 2 * len(sub) / (t2 - t0) / 1e9


def main() -> None:
    data = load_corpus()
    if "--smoke" in sys.argv:  # CI sanity tier: one small file, CPU-ok
        data = data[: 1 << 18]
    if "--baseline" in sys.argv:
        gbps = measure_baseline(data)
        print(f"baseline aggregate: {gbps:.4f} GB/s", file=sys.stderr)
        print(json.dumps({"metric": "reference-serial aggregate", "value": gbps,
                          "unit": "GB/s", "vs_baseline": 1.0}))
        return

    from redux_tpu.bench import run_device_benchmark

    result = run_device_benchmark(data)
    value = result["aggregate_gbps"]
    print(
        f"encode {result['encode_gbps']:.3f} GB/s, decode {result['decode_gbps']:.3f} GB/s, "
        f"e2e {result['encode_e2e_gbps']:.3f}/{result['decode_e2e_gbps']:.3f} GB/s, "
        f"ratio {result['ratio']:.3f}, pallas={result['pallas']}, verified={result['verified']}, "
        f"spread enc {result['encode_spread_ms']} / dec {result['decode_spread_ms']} ms, "
        f"host<->device tunnel {result['tunnel_gbps']:.3f} GB/s (e2e bound)",
        file=sys.stderr,
    )
    rl = result["roofline"]
    print(
        f"roofline (op-model vs assumed {rl['vpu_peak_tops_assumed']:.1f} "
        f"Tops/s VPU peak): decode kernel "
        f"{rl['decode_kernel']['achieved_teops']} Teops/s "
        f"({rl['decode_kernel']['pct_of_vpu_peak']}%), encode pipeline "
        f"{rl['encode_pipeline']['achieved_teops']} Teops/s "
        f"({rl['encode_pipeline']['pct_of_vpu_peak']}%)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "calgary+large aggregate encode+decode throughput (device-resident, 1 chip)",
        "value": round(value, 4),
        "unit": "GB/s",
        "vs_baseline": round(value / BASELINE_GBPS, 2),
    }))


if __name__ == "__main__":
    main()
