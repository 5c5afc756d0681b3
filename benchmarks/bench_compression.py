"""Compression-pipeline microbenchmarks (per-layer costs on the bench shapes).

Round-1 phase accounting (NOTES.md) put compression at 0.4-0.5 s of every
~1.0 s 16K-token prefill batch: scoring ~7 ms/layer + top-k ~3 + sort ~5 +
store ~2. This script times each stage standalone on the chip so the round-2
optimizations (fused postrope scoring, reshape z-scores, Minv leverage path,
bucketed top-k) are driven by measurements, not guesses.

Usage: python benchmarks/bench_compression.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.compression.chunking import (
    make_chunk_meta_aligned,
    scatter_to_chunks,
    chunk_row_mask,
    segment_zscore,
)
from compactor_vllm_tpu.compression.compactor import (
    POSTROPE_CHUNK,
    RIDGE,
    approximate_leverage_scores,
    make_phi,
    non_causal_chunk_attention_scores,
)
from compactor_vllm_tpu.compression.select import topk_retain_indices

# Bench workload geometry (bench.py: 4 x 4096-token seqs packed into 16K).
B_REAL, SEQ_LEN = 4, 4096
H, HQ, D = 8, 16, 128
CHUNK = 512
T_PAD = 16896  # 4 * 4096 + slack, 512-aligned
B_PAD = 4
LAYERS = 28
RETAIN = SEQ_LEN * H // 2  # 50% joint (token, head) budget


def log(m):
    print(m, file=sys.stderr, flush=True)


def chain_time(fn, args_list, n_chain=LAYERS):
    jax.block_until_ready(fn(*args_list[0]))
    times = []
    for a in args_list:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n_chain


def packed_meta():
    starts = np.arange(B_PAD, dtype=np.int32) * SEQ_LEN
    lens = np.full(B_PAD, SEQ_LEN, np.int32)
    seq_idx = np.zeros(T_PAD, np.int32)
    in_pos = np.zeros(T_PAD, np.int32)
    valid = np.zeros(T_PAD, bool)
    for i in range(B_REAL):
        sl = slice(i * SEQ_LEN, (i + 1) * SEQ_LEN)
        seq_idx[sl] = i
        in_pos[sl] = np.arange(SEQ_LEN)
        valid[sl] = True
    return starts, lens, seq_idx, in_pos, valid


def chained(body):
    """Wrap a per-layer body into a 28-deep scan over varying dummy bases."""

    @jax.jit
    def run(*args):
        def step(c, base):
            out = body(*args, base)
            return c + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(step, 0.0, jnp.zeros(LAYERS, jnp.int32))
        return tot

    return run


def inputs(seed):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(T_PAD, HQ, D)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(T_PAD, H, D)).astype(np.float32), jnp.bfloat16)
    return q, k


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({jax.default_backend()})")
    starts, lens, seq_idx, in_pos, valid = packed_meta()
    starts_j, lens_j = jnp.asarray(starts), jnp.asarray(lens)
    seq_idx_j, in_pos_j, valid_j = (
        jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid)
    )
    phi = make_phi(D, 48)
    meta_pre = make_chunk_meta_aligned(seq_idx_j, valid_j, CHUNK)
    meta_post = make_chunk_meta_aligned(seq_idx_j, valid_j, POSTROPE_CHUNK)
    results = {}

    def report(name, dt):
        log(f"{name:>42}: {dt*1e3:8.3f} ms/layer")
        results[name] = dt * 1e3

    # --- pre-RoPE leverage scores (current: Cholesky + triangular solve)
    def pre_current(k, base):
        return approximate_leverage_scores(
            k, phi, meta_pre, CHUNK, aligned=True, token_valid=valid_j
        ) + base
    report("prerope leverage (current)", chain_time(
        chained(pre_current), [(inputs(i)[1],) for i in range(4)]))

    # --- pre-RoPE variant: explicit Gram inverse + quadratic-form einsum
    def pre_minv(k, base):
        X = jnp.einsum("thd,ds->ths", k.astype(jnp.float32), phi)
        Xc = scatter_to_chunks(X, meta_pre, CHUNK, True)  # [NC, C, H, s]
        mask = chunk_row_mask(meta_pre, CHUNK)
        Xc = jnp.where(mask[:, :, None, None], Xc, 0.0)
        cnt = jnp.maximum(meta_pre.chunk_valid_count.astype(jnp.float32), 1.0)
        mean = Xc.sum(axis=1) / cnt[:, None, None]
        Xc = jnp.where(mask[:, :, None, None], Xc - mean[:, None], 0.0)
        G = jnp.einsum("nchs,ncht->nhst", Xc, Xc)
        s = phi.shape[1]
        G = G + RIDGE * jnp.eye(s, dtype=jnp.float32)
        L = jnp.linalg.cholesky(G)
        eye = jnp.broadcast_to(jnp.eye(s, dtype=jnp.float32), G.shape)
        Li = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
        Minv = jnp.einsum("nhts,nhtu->nhsu", Li, Li)
        Y = jnp.einsum("nchs,nhst->ncht", Xc, Minv)
        sc = jnp.maximum(jnp.einsum("ncht,ncht->nch", Y, Xc), 0.0)
        out = sc.reshape(T_PAD, H)
        return segment_zscore(out, meta_pre.gcid, valid_j, meta_pre.num_chunks) + base
    report("prerope leverage (Minv einsum)", chain_time(
        chained(pre_minv), [(inputs(i)[1],) for i in range(4)]))

    # --- post-RoPE chunk col-mass (current dense jnp)
    def post_current(q, k, base):
        return non_causal_chunk_attention_scores(
            q, k, meta_post, seq_idx_j, valid_j, num_seqs=B_PAD, aligned=True
        ) + base
    report("postrope colmass (current jnp)", chain_time(
        chained(post_current), [inputs(i) for i in range(4)]))

    # --- top-k at full t_pad width vs sequence-bucket width
    scores = jnp.asarray(
        np.random.default_rng(0).normal(size=(T_PAD, H)).astype(np.float32)
    )
    retain = jnp.full(B_PAD, RETAIN, jnp.int32)
    for max_q, tag in [(T_PAD, "t_pad"), (4608, "seq bucket")]:
        k_static = 1 << (RETAIN - 1).bit_length()
        def topk(sc, base):
            idx, v = topk_retain_indices(
                sc + base.astype(jnp.float32), starts_j, lens_j, retain,
                max_q=max_q, k_static=k_static,
            )
            return idx
        report(f"topk_retain (max_q={tag})", chain_time(
            chained(topk), [(scores,)]))

    # --- head-grouping machinery of the compressed store (sort+rank+gather)
    K = 1 << (RETAIN - 1).bit_length()
    rng = np.random.default_rng(1)
    tki = jnp.asarray(
        rng.integers(0, SEQ_LEN * H, size=(B_PAD, K)).astype(np.int32)
    )
    tkv = jnp.asarray(np.arange(K)[None, :] < RETAIN).repeat(B_PAD, 0)

    def grouping(idx, valid_k, base):
        head = (idx % H).astype(jnp.int32)
        head_key = jnp.where(valid_k, head, H) + base
        shift = max(K - 1, 1).bit_length()
        packed = head_key * (1 << shift) + jnp.arange(K, dtype=jnp.int32)[None, :]
        skey = jnp.sort(packed, axis=1)
        head_sorted = skey >> shift
        order = skey & ((1 << shift) - 1)
        counts = jax.vmap(lambda x: jnp.bincount(x, length=H + 1))(head_sorted)
        return counts[:, :H] + order.sum()
    report("store head-grouping (sort+bincount)", chain_time(
        chained(grouping), [(tki, tkv)]))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
