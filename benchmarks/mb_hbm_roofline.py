"""Raw HBM bandwidth roofline: what can ANY kernel hope to stream?

Two XLA-native probes (no Pallas): a pure read (full-array f32 reduce of a
bf16 array) and a read+write (elementwise add). Chained inside one jit with
runtime-varied operands (axon relay memoizes identical dispatches and costs
~4.3 ms per dispatch — NOTES.md measurement gotchas). These bound the decode
attention floor: the decode kernel streams the live KV bytes once per step,
so step_time >= live_kv_bytes / read_bw.

Run: python benchmarks/mb_hbm_roofline.py [mib]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 16


def _time(run, args):
    float(run(*args[0]))  # compile + warm
    ts = []
    for a in args:
        t0 = time.perf_counter()
        float(run(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REPS


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = mib * (1 << 20) // 2  # bf16 elements
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.bfloat16)

    @jax.jit
    def read_only(x, deltas):
        def step(c, d):
            return c + jnp.sum((x + d.astype(x.dtype)).astype(jnp.float32)), None

        s, _ = jax.lax.scan(step, jnp.float32(0), deltas)
        return s

    @jax.jit
    def read_write(x, deltas):
        def step(c, d):
            y = x + d.astype(x.dtype)  # read n*2 bytes, write n*2 bytes
            return y, None

        y, _ = jax.lax.scan(step, x * 0, deltas)
        return jnp.sum(y[:8].astype(jnp.float32))

    args = [(x, jnp.arange(REPS, dtype=jnp.int32) * 0 + i * 0) for i in range(4)]
    jax.block_until_ready(args)

    dt = _time(read_only, args)
    print(f"read-only  {mib} MiB: {dt*1e3:7.3f} ms  {n*2/dt/1e9:7.1f} GB/s")
    dt = _time(read_write, args)
    print(f"read+write {mib} MiB: {dt*1e3:7.3f} ms  {2*n*2/dt/1e9:7.1f} GB/s (r+w bytes)")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    main()
