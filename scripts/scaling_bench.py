"""Scaling-efficiency sweep over a virtual device mesh (BASELINE configs[5]).

Weak scaling: fixed blocks-per-device, mesh sizes 1..8 (virtual CPU
devices; real pods swap the mesh for TPU chips/hosts with the identical
shard_map program).  Efficiency(N) = throughput(N) / (N * throughput(1)).

Writes SCALING_r{N}.json at the repo root.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/scaling_bench.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from redux_tpu.models.dense import uniform_init_cum
from redux_tpu.ops.coder import max_block_words
from redux_tpu.ops.ranks import precompute_encode_model
from redux_tpu.parallel import data_parallel_mesh, decode_blocks_sharded, encode_blocks_sharded
from redux_tpu.params import Parameters
from jax.sharding import NamedSharding, PartitionSpec as P


def run(n_dev, blocks_per_dev=24, k=8192, delta=16):
    params = Parameters.tpu_wide()
    mesh = data_parallel_mesh(n=n_dev)
    b = blocks_per_dev * n_dev
    data = open("/root/reference/resources/calgary/book1", "rb").read()
    data = (data * (b * k // len(data) + 1))[: b * k]
    syms = np.frombuffer(data, np.uint8).reshape(b, k).astype(np.int32)
    lens = np.full(b, k, np.int32)
    ic = uniform_init_cum(params).astype(np.int32)
    shard = NamedSharding(mesh, P("dp"))
    sj = jax.device_put(jnp.asarray(syms), shard)
    lj = jax.device_put(jnp.asarray(lens), shard)
    icj = jnp.asarray(ic)
    n_words = max_block_words(min(257 + delta * k, params.freq_max), params.symbol_count, params, k)

    def enc():
        lo, hi, tot, _, _, _ = precompute_encode_model(sj, lj, icj, params.freq_max, delta=delta)
        return encode_blocks_sharded(lo, hi, tot, lj, params, n_words, mesh)

    words, blens, _ = jax.block_until_ready(enc())
    t0 = time.perf_counter()
    for _ in range(3):
        words, blens, _ = jax.block_until_ready(enc())
    t_enc = (time.perf_counter() - t0) / 3

    dec = decode_blocks_sharded(words, lj, icj, params, k, mesh, delta=delta)
    jax.block_until_ready(dec)
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(decode_blocks_sharded(words, lj, icj, params, k, mesh, delta=delta))
    t_dec = (time.perf_counter() - t0) / 3

    ok = np.array_equal(np.asarray(dec)[:, :k].astype(np.uint8),
                        syms.astype(np.uint8))
    return {"n_dev": n_dev, "bytes": len(data), "t_enc": t_enc, "t_dec": t_dec,
            "gbps": 2 * len(data) / (t_enc + t_dec) / 1e9, "verified": bool(ok)}


def main():
    results = [run(n) for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    base = results[0]
    per_dev0 = base["gbps"] / base["n_dev"]
    ncores = os.cpu_count() or 1
    for r in results:
        r["efficiency"] = r["gbps"] / (r["n_dev"] * per_dev0)
        # virtual devices beyond the physical cores time-share them; the
        # honest denominator is the deliverable parallel hardware
        r["efficiency_vs_cores"] = r["gbps"] / (min(r["n_dev"], ncores) * per_dev0)
    out = {
        "mode": "weak-scaling, virtual CPU mesh (shard_map dp axis)",
        "note": "host has %d physical cores; n_dev beyond that oversubscribes "
                "threads, so efficiency_vs_cores is the meaningful column. "
                "Real pods swap the mesh for TPU chips/hosts; identical program."
                % ncores,
        "physical_cores": ncores,
        "results": results,
        "min_efficiency_n_ge_2": min(r["efficiency"] for r in results[1:]),
        "min_efficiency_vs_cores_n_ge_2": min(r["efficiency_vs_cores"] for r in results[1:]),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALING_r2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
