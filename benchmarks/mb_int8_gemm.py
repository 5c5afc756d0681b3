"""Native XLA int8 vs bf16 matmul rate probe.

The v5e MXU lists int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOPS). Round-3
measured Pallas/Mosaic int8 dots NOT reaching native rate; this probes plain
XLA `dot_general` (outside Pallas) at model-GEMM shapes to decide whether a
W8A8 activation-quantized path (layers/quant.py extension) is a real lever.

Timing: in-jit chained invocations with runtime-varied operands (relay
memoization; see NOTES.md). Run: python benchmarks/mb_int8_gemm.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 24


def bench(m, k, n, mode):
    key = jax.random.PRNGKey(0)
    if mode == "bf16":
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.normal(key, (k, n), jnp.bfloat16)

        def one(x):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    elif mode == "int8":
        x = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        w = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

        def one(x):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    else:  # w8a16: weight-only int8, bf16 activations (current quant.py path)
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

        def one(x):
            return jax.lax.dot_general(
                x, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @jax.jit
    def run(x, deltas):
        def step(c, d):
            o = one(x + d.astype(x.dtype))
            return c + o[0, 0].astype(jnp.float32), None

        s, _ = jax.lax.scan(step, jnp.float32(0), deltas)
        return s

    args = [
        (x, (np.arange(REPS) % 3 + i).astype(np.int8 if x.dtype == jnp.int8 else np.float32))
        for i in range(4)
    ]
    args = [(a, jnp.asarray(d, x.dtype if x.dtype == jnp.int8 else jnp.bfloat16)) for a, d in args]
    float(run(*args[0]))
    ts = []
    for a in args:
        t0 = time.perf_counter()
        float(run(*a))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / REPS
    ops = 2 * m * k * n
    print(f"{mode:6s} m={m:5d} k={k:5d} n={n:5d}  {dt*1e3:7.3f} ms  "
          f"{ops/dt/1e12:6.1f} T{'OPS' if mode=='int8' else 'F/s'}")


def main():
    print("device:", jax.devices()[0].device_kind)
    shapes = [
        (16384, 2048, 2048),   # prefill-batch qkv-ish
        (16384, 2048, 6144),   # prefill mlp
        (64, 2048, 6144),      # decode mlp (weight-read bound)
    ]
    for m, k, n in shapes:
        for mode in ("bf16", "int8", "w8a16"):
            bench(m, k, n, mode)
        print()


if __name__ == "__main__":
    main()
