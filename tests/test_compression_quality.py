"""Semantic sanity of the compression scoring math (beyond shape parity):

- Approximate leverage scores must rank tokens that span unique directions
  above near-duplicate (redundant) tokens — that is the entire premise of
  Compactor (arXiv:2507.08143): leverage ~ how hard a row is to reconstruct
  from the others.
- SnapKV must rank keys that the window queries attend to above keys they
  ignore, and always retain the window itself.
- Protected ranges must survive selection regardless of score.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.compression.chunking import make_chunk_meta
from compactor_vllm_tpu.compression.compactor import (
    approximate_leverage_scores,
    make_phi,
)
from compactor_vllm_tpu.compression.select import topk_retain_indices
from compactor_vllm_tpu.compression.snapkv import snapkv_scores


def packed_single(T):
    seq_idx = np.zeros(T, np.int32)
    in_pos = np.arange(T, dtype=np.int32)
    valid = np.ones(T, bool)
    lens = np.array([T], np.int32)
    return map(jnp.asarray, (lens, seq_idx, in_pos, valid))


def test_leverage_prefers_unique_directions():
    rng = np.random.default_rng(0)
    T, H, D = 64, 2, 32
    base = rng.normal(size=(1, H, D)).astype(np.float32)
    # Tokens 0..47: tiny perturbations of ONE direction (redundant).
    k = np.repeat(base, T, axis=0) + 0.01 * rng.normal(size=(T, H, D)).astype(np.float32)
    # Tokens 48..63: strong unique directions (high leverage).
    unique = rng.normal(size=(16, H, D)).astype(np.float32) * 3.0
    k[48:] = unique
    lens, seq_idx, in_pos, valid = packed_single(T)
    meta = make_chunk_meta(lens, seq_idx, in_pos, valid, chunk_size=64, num_chunks=2)
    phi = make_phi(D, 16)
    scores = np.asarray(
        approximate_leverage_scores(jnp.asarray(k), phi, meta, 64)
    )  # [T, H]
    # Every unique token outscores the median redundant token, in every head.
    med_redundant = np.median(scores[:48], axis=0)
    assert (scores[48:] > med_redundant[None, :]).mean() > 0.95
    # And the top-16 scored tokens are (almost all) the unique ones.
    for h in range(H):
        top = set(np.argsort(scores[:, h])[-16:].tolist())
        assert len(top & set(range(48, 64))) >= 14


def test_snapkv_prefers_attended_keys_and_window():
    rng = np.random.default_rng(1)
    T, H, HQ, D, W = 96, 2, 4, 32, 32
    k = rng.normal(size=(T, H, D)).astype(np.float32) * 0.1
    q = rng.normal(size=(T, HQ, D)).astype(np.float32) * 0.1
    # Make keys 5 and 20 strongly attended by the window queries.
    hot = rng.normal(size=(HQ, D)).astype(np.float32)
    q[-W:] = hot[None] + 0.01 * q[-W:]
    for t in (5, 20):
        k[t] = hot.reshape(H, HQ // H, D).mean(axis=1) * 5.0
    starts = jnp.asarray(np.array([0], np.int32))
    lens, seq_idx, in_pos, valid = packed_single(T)
    scores = np.asarray(
        snapkv_scores(
            jnp.asarray(q), jnp.asarray(k), starts, lens, seq_idx, in_pos, valid,
            jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32), max_q=T, window=W,
        )
    )
    non_window = scores[: T - W]
    for h in range(H):
        order = np.argsort(non_window[:, h])[::-1].tolist()
        # KPOOL=5 causal pooling credits each hot key and its 4 successors,
        # so the two hot neighborhoods own the top ranks.
        hot_zone = set(range(5, 10)) | set(range(20, 25))
        assert set(order[:10]) <= hot_zone, order[:10]
    # Window keys carry the +inf sentinel (POS_INF) — always retained.
    from compactor_vllm_tpu.compression.compactor import POS_INF

    assert (scores[T - W :] >= POS_INF).all()


def test_protected_tokens_always_selected():
    rng = np.random.default_rng(2)
    T, H = 40, 2
    scores = rng.normal(size=(T, H)).astype(np.float32)
    from compactor_vllm_tpu.compression.compactor import apply_protection

    lens, seq_idx, in_pos, valid = packed_single(T)
    protected = apply_protection(
        jnp.asarray(scores), lens, seq_idx, in_pos, valid,
        jnp.asarray([3], jnp.int32), jnp.asarray([5], jnp.int32),
    )
    retain = jnp.asarray([int(0.4 * T * H)], jnp.int32)
    idx, valid_k = topk_retain_indices(
        protected, jnp.asarray([0], jnp.int32), lens, retain,
        max_q=T, k_static=64,
    )
    idx, valid_k = np.asarray(idx)[0], np.asarray(valid_k)[0]
    kept_tokens = set((idx[valid_k] // H).tolist())
    for t in list(range(3)) + list(range(T - 5, T)):
        assert t in kept_tokens, f"protected token {t} was evicted"
