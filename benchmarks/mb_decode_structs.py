"""Microbench: decode-attention inner-loop structures on the real chip.

Isolates the per-(b, h) attention compute (no paging DMAs — Pallas block
pipeline streams K/V) to compare MXU structures for the G-row decode dot:

  qmajor  — s = dot(q[G,D], K^T) -> [G, CTX]; PV = dot(p, V)     (current)
  ctxmajor— s^T = dot(K[CTX,D], q^T) -> [CTX, G] (M=CTX streams);
            PV via dot_general(p^T, V, contract CTX)
  int8    — qmajor with int8 K/V (and int8 q / int8 p where measured)

Each variant runs GRID programs of one (b, h) pair each, CTX tokens,
D=128, G in {2, 4}. Reports ms per program-batch and effective GB/s.

Run: python benchmarks/mb_decode_structs.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _softmax_rows(s):  # [G, CTX] -> p, l
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l


def k_qmajor(q_ref, k_ref, v_ref, o_ref, *, gsz):
    q = q_ref[0]  # [G, D]
    ctx = k_ref.shape[1]
    acc = jnp.zeros((q.shape[0], D), jnp.float32)
    l_tot = jnp.zeros((q.shape[0], 1), jnp.float32)
    m_prev = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    for g0 in range(0, ctx, gsz):
        k = k_ref[0, pl.ds(g0, gsz), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * LOG2E
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        corr = jnp.exp2(m_prev - m_new)
        l_tot = l_tot * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, pl.ds(g0, gsz), :]
        acc = acc * corr + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_prev = m_new
    o_ref[0] = (acc / l_tot).astype(o_ref.dtype)


def k_qmajor_full(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * LOG2E
    p, l = _softmax_rows(s)
    v = v_ref[0]
    acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def k_ctxmajor(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [G, D]
    k = k_ref[0]  # [CTX, D]
    # M = CTX streams through a stationary [D, G] tile.
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * LOG2E  # [CTX, G]
    m = jnp.max(st, axis=0, keepdims=True)  # [1, G]
    p = jnp.exp2(st - m)  # [CTX, G]
    l = jnp.sum(p, axis=0, keepdims=True)  # [1, G]
    v = v_ref[0]  # [CTX, D]
    # acc[G, D]: contract CTX (dim 0 of both) — lhs-transposed form.
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc / l.T).astype(o_ref.dtype)


def k_dma_only(q_ref, k_ref, v_ref, o_ref):
    """No attention math: touch one sublane chunk of K/V so the block
    pipeline still streams the full blocks. Measures the pipeline's pure
    data-movement floor at this grid/block shape."""
    touched = (
        k_ref[0, 0:8, :].sum(axis=0, keepdims=True)
        + v_ref[0, 0:8, :].sum(axis=0, keepdims=True)
    )  # [1, D]; broadcast against q [G, D] to fill the output block
    o_ref[0] = (touched + q_ref[0] * 0).astype(o_ref.dtype)


def k_qk_only(q_ref, k_ref, v_ref, o_ref):
    """QK dot + max only (no softmax / PV): isolates the first dot."""
    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = jnp.broadcast_to(
        jnp.max(s, axis=-1, keepdims=True), o_ref.shape[1:]
    ).astype(o_ref.dtype) + v_ref[0, 0:1, :].astype(o_ref.dtype) * 0


def k_pv_only(q_ref, k_ref, v_ref, o_ref):
    """PV dot only with a constant p: isolates the second dot."""
    g = q_ref.shape[1]
    ctx = v_ref.shape[1]
    p = jnp.full((g, ctx), 1.0 / ctx, jnp.bfloat16) + q_ref[0, :, 0:1] * 0
    acc = jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (acc + k_ref[0, 0:1, :].astype(jnp.float32) * 0).astype(
        o_ref.dtype
    )


def k_qmajor_multi(q_ref, k_ref, v_ref, o_ref):
    """P (b,h) pairs per grid step: same math as qmajor/full per pair, but
    one pipeline step streams P pairs' K/V. If the floor is per-grid-step
    overhead (bubbles, copy waits), this divides it by P."""
    P = q_ref.shape[0]
    for p_i in range(P):
        q = q_ref[p_i]
        s = jax.lax.dot_general(
            q, k_ref[p_i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * LOG2E
        p, l = _softmax_rows(s)
        v = v_ref[p_i]
        acc = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[p_i] = (acc / l).astype(o_ref.dtype)


def k_qmajor_stackP(q_ref, k_ref, v_ref, o_ref):
    """P pairs per grid step with the P QK dots fused into ONE dot by
    reshaping K [P, CTX, D] -> [P*CTX, D]: s_all = q_all? No — each pair has
    its own q, so fuse along N instead: compute s for pair p against the
    FULL [P*CTX] key axis and mask to its own range. P x compute waste on
    QK, but a single [P*G, P*CTX] dot whose passes pipeline."""
    P, ctx, _ = k_ref.shape
    qs = q_ref[...].reshape(P * q_ref.shape[1], D)  # [P*G, D]
    ks = k_ref[...].reshape(P * ctx, D)
    s = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * LOG2E  # [P*G, P*ctx]
    g = q_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // g
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) // ctx
    s = jnp.where(rows == cols, s, NEG_INF)
    p, l = _softmax_rows(s)
    vs = v_ref[...].reshape(P * ctx, D)
    acc = jax.lax.dot(
        p.astype(vs.dtype), vs, preferred_element_type=jnp.float32
    )  # [P*G, D]
    o_ref[...] = (acc / l).reshape(o_ref.shape).astype(o_ref.dtype)


def k_qmajor_int8(q_ref, k_ref, v_ref, o_ref):
    """int8 K (per-token scales ignored for timing), q int8, int32 accum."""
    q = q_ref[0]  # [G, D] int8
    k = k_ref[0]  # [CTX, D] int8
    s32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = s32.astype(jnp.float32) * (LOG2E / (127.0 * 127.0))
    p, l = _softmax_rows(s)
    v = v_ref[0]  # [CTX, D] int8
    pq = (p * 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        pq, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[0] = (acc.astype(jnp.float32) / (l * 127.0 * 127.0)).astype(
        o_ref.dtype
    )


def k_ctxmajor_int8(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # [G, D] int8
    k = k_ref[0]  # [CTX, D] int8
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * (LOG2E / (127.0 * 127.0))  # [CTX, G]
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp2(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    v = v_ref[0]
    pq = (p * 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        pq, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[0] = (acc.astype(jnp.float32) / (l.T * 127.0 * 127.0)).astype(
        o_ref.dtype
    )


def run_variant(name, kernel, nprog, ctx, g, kv_dtype, q_dtype=None, P=1):
    q_dtype = q_dtype or kv_dtype
    out_dtype = jnp.bfloat16

    @jax.jit
    def mk(key):
        ks = jax.random.split(key, 3)
        if jnp.issubdtype(jnp.dtype(q_dtype), jnp.integer):
            q = jax.random.randint(ks[0], (nprog, g, D), -127, 127, jnp.int8)
            k = jax.random.randint(ks[1], (nprog, ctx, D), -127, 127, jnp.int8)
            v = jax.random.randint(ks[2], (nprog, ctx, D), -127, 127, jnp.int8)
        else:
            q = jax.random.normal(ks[0], (nprog, g, D), kv_dtype)
            k = jax.random.normal(ks[1], (nprog, ctx, D), kv_dtype)
            v = jax.random.normal(ks[2], (nprog, ctx, D), kv_dtype)
        return q, k, v

    fn = pl.pallas_call(
        kernel,
        grid=(nprog // P,),
        in_specs=[
            pl.BlockSpec((P, g, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((P, ctx, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((P, ctx, D), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((P, g, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nprog, g, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    # The axon relay costs ~4.3 ms per dispatch: amortize by scanning REPS
    # kernel invocations inside one jit (bench_kernels.py pattern: a runtime
    # `bases` zeros array varied per step stops XLA from hoisting the
    # otherwise loop-invariant call; float(out) is the sync).
    REPS = 28

    @jax.jit
    def run(q, k, v, deltas):  # deltas: [REPS] runtime zeros (int offsets)
        def step(c, d):
            o = fn(q + d.astype(q.dtype), k, v)
            return c + jnp.sum(o.astype(jnp.float32)), None

        s, _ = jax.lax.scan(step, jnp.float32(0), deltas)
        return s

    q, k, v = mk(jax.random.PRNGKey(0))
    args = [
        (q, k, v, jnp.zeros((REPS,), jnp.int32) + i * 0)
        for i in range(4)
    ]
    jax.block_until_ready(args)
    float(run(*args[0]))  # compile + warm
    times = []
    for a in args:
        t0 = time.perf_counter()
        float(run(*a))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / REPS
    kv_bytes = 2 * nprog * ctx * D * np.dtype(kv_dtype).itemsize
    print(
        f"{name:22s} nprog={nprog:4d} ctx={ctx:5d} G={g}  "
        f"{dt * 1e3:7.3f} ms  {kv_bytes / dt / 1e9:7.1f} GB/s"
    )
    return dt


def main():
    import sys

    print("device:", jax.devices()[0].device_kind)
    mode = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if mode == "full":
        shapes = [(g, c) for g in (2, 4) for c in (1024, 2048, 4096)]
        for g, ctx in shapes:
            nprog = 512 * 2048 // ctx  # constant total KV bytes
            run_variant("qmajor/1024-loop",
                        functools.partial(k_qmajor, gsz=1024),
                        nprog, ctx, g, jnp.bfloat16)
            run_variant("qmajor/full", k_qmajor_full, nprog, ctx, g,
                        jnp.bfloat16)
            run_variant("ctxmajor", k_ctxmajor, nprog, ctx, g, jnp.bfloat16)
            run_variant("qmajor/int8", k_qmajor_int8, nprog, ctx, g, jnp.int8)
            run_variant("ctxmajor/int8", k_ctxmajor_int8, nprog, ctx, g,
                        jnp.int8)
            print()
        return
    if mode == "probe":
        # Attribution probe at the engine shape: what is the 3.7 us/program
        # floor made of, and does it amortize with pairs-per-grid-step?
        g, ctx, nprog = 2, 2048, 512
        run_variant("dma-only", k_dma_only, nprog, ctx, g, jnp.bfloat16)
        run_variant("qk-only", k_qk_only, nprog, ctx, g, jnp.bfloat16)
        run_variant("pv-only", k_pv_only, nprog, ctx, g, jnp.bfloat16)
        run_variant("qmajor/full", k_qmajor_full, nprog, ctx, g, jnp.bfloat16)
        for P in (2, 4, 8):
            run_variant(f"multi P={P}", k_qmajor_multi, nprog, ctx, g,
                        jnp.bfloat16, P=P)
        for P in (4,):
            run_variant(f"stackN P={P}", k_qmajor_stackP, nprog, ctx, g,
                        jnp.bfloat16, P=P)
        # Scaling in nprog at constant total bytes: per-program overhead
        # shows as time growing with nprog.
        for ctx2 in (1024, 4096):
            run_variant("qmajor/full", k_qmajor_full, 512 * 2048 // ctx2,
                        ctx2, g, jnp.bfloat16)
        return


if __name__ == "__main__":
    main()
