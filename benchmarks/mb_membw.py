"""HBM bandwidth sanity probe: what does this chip actually sustain?

Several unrelated decode measurements land at ~280 GB/s effective (decode
attention structures, the lm_head GEMM at M=64) — either the chip's
streaming rate for these patterns is ~1/3 of the 819 GB/s spec, or the
measurement harness is biased. This times the simplest possible patterns:

  copy      — y = x + 1 over 1 GB bf16 (read + write)
  reduce    — x.sum() over 1 GB (pure read)
  gemm M=64 — [64, 2048] @ [2048, 151936] bf16 (weight streaming, decode)
  gemm M=8K — [8192, 2048] @ same (compute-bound reference point)
  int8 gemm M=64 — int8 weights, bf16 activations, cast fused into dot

Run: python benchmarks/mb_membw.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


def chain(fn, *args):
    """In-jit scan of REPS invocations with runtime-varied input (the
    per-dispatch relay overhead and XLA loop hoisting both bias naive
    timing; see NOTES.md measurement gotchas)."""

    @jax.jit
    def run(deltas, *a):
        def body(c, d):
            out = fn(c + d, *a)
            return out, None

        c, _ = jax.lax.scan(body, jnp.float32(0), deltas)
        return c

    deltas = jnp.zeros((REPS,), jnp.float32)
    float(run(deltas, *args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(deltas, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / REPS


def main():
    print("device:", jax.devices()[0].device_kind, file=sys.stderr)
    n = 512 * 1024 * 1024  # 1 GB bf16
    x = jnp.ones((n,), jnp.bfloat16)

    dt = chain(lambda c, x: jnp.float32((x + c.astype(jnp.bfloat16))[::65536].sum()), x)
    print(f"copy-ish (read 1GB + tiny write): {dt*1e3:7.3f} ms  "
          f"{1.073/dt:6.0f} GB/s read", file=sys.stderr)

    dt = chain(lambda c, x: x.astype(jnp.float32).sum() + c, x)
    print(f"reduce (read 1GB):                {dt*1e3:7.3f} ms  "
          f"{1.073/dt:6.0f} GB/s", file=sys.stderr)

    k, v = 2048, 151936
    w = jnp.ones((k, v), jnp.bfloat16)
    for m in (64, 8192):
        a = jnp.ones((m, k), jnp.bfloat16)
        dt = chain(
            lambda c, a, w: ((a + c.astype(a.dtype)) @ w).astype(jnp.float32)[::37, ::1031].sum(),
            a, w,
        )
        bytes_w = k * v * 2
        fl = 2 * m * k * v
        print(f"gemm M={m:<5d}: {dt*1e3:7.3f} ms  "
              f"{bytes_w/dt/1e9:6.0f} GB/s wstream  {fl/dt/1e12:5.1f} TF/s",
              file=sys.stderr)

    w8 = jnp.ones((k, v), jnp.int8)
    scale = jnp.full((v,), 0.01, jnp.bfloat16)
    a = jnp.ones((64, k), jnp.bfloat16)
    dt = chain(
        lambda c, a, w8: (((a + c.astype(a.dtype)) @ w8.astype(jnp.bfloat16))
                          * scale).astype(jnp.float32)[::37, ::1031].sum(),
        a, w8,
    )
    print(f"gemm M=64 int8-weight (fused cast): {dt*1e3:7.3f} ms  "
          f"{k*v/dt/1e9:6.0f} GB/s wstream", file=sys.stderr)


if __name__ == "__main__":
    main()
