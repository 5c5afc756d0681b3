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
from compactor_vllm_tpu.compression.select import threshold_select, topk_retain_indices
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
    # Engine path: threshold selection (+inf protected scores always clear
    # any finite threshold).
    sel = threshold_select(
        protected, jnp.asarray([0], jnp.int32), lens, retain
    )
    rank = np.asarray(sel.rank)
    for t in list(range(3)) + list(range(T - 5, T)):
        assert (rank[t] >= 0).all(), f"protected token {t} was evicted"
    # Legacy top-k oracle agrees on the kept multiset.
    idx, valid_k = topk_retain_indices(
        protected, jnp.asarray([0], jnp.int32), lens, retain,
        max_q=T, k_static=64,
    )
    idx, valid_k = np.asarray(idx)[0], np.asarray(valid_k)[0]
    kept_pairs = {(int(p) // H, int(p) % H) for p in idx[valid_k]}
    sel_pairs = {(t, h) for t, h in zip(*np.nonzero(rank >= 0))}
    assert kept_pairs == sel_pairs


def test_zscore_aligned_matches_segment_zscore():
    """Reshape-based aligned z-scores (per-chunk and per-sequence) must equal
    the segment_sum formulation they replace on the hot path."""
    from compactor_vllm_tpu.compression.chunking import (
        make_chunk_meta_aligned,
        segment_zscore,
        zscore_aligned,
    )

    rng = np.random.default_rng(3)
    C, B = 32, 3
    lens = [70, 32, 45]
    T = 192  # sequences packed at 32-token-aligned starts: 0, 96, 128
    starts = [0, 96, 128]
    seq_idx = np.zeros(T, np.int32)
    valid = np.zeros(T, bool)
    for b, (s, L) in enumerate(zip(starts, lens)):
        seq_idx[s:s + L] = b
        valid[s:s + L] = True
    scores = jnp.asarray(rng.normal(size=(T, 4)).astype(np.float32))
    seq_idx, valid = jnp.asarray(seq_idx), jnp.asarray(valid)

    meta = make_chunk_meta_aligned(seq_idx, valid, C)
    got = zscore_aligned(scores, None, valid, C, "chunk")
    want = segment_zscore(scores, meta.gcid, valid, meta.num_chunks)
    np.testing.assert_allclose(
        np.asarray(got)[np.asarray(valid)], np.asarray(want)[np.asarray(valid)],
        rtol=1e-5, atol=1e-5,
    )

    got = zscore_aligned(scores, seq_idx, valid, C, "seq", num_seqs=B)
    want = segment_zscore(scores, seq_idx, valid, B)
    np.testing.assert_allclose(
        np.asarray(got)[np.asarray(valid)], np.asarray(want)[np.asarray(valid)],
        rtol=1e-5, atol=1e-5,
    )


def test_compactor_scores_with_external_colmass_matches():
    """compactor_scores(postrope_colmass=oracle colmass) must equal the
    self-computed path — the contract the fused kernel scoring relies on."""
    from compactor_vllm_tpu.compression.chunking import make_chunk_meta_aligned
    from compactor_vllm_tpu.compression.compactor import (
        POSTROPE_CHUNK,
        chunk_colmass,
        compactor_scores,
    )

    rng = np.random.default_rng(4)
    T, H, G, D = 512, 2, 2, 32
    lens = np.array([200, 131], np.int32)
    starts = [0, 256]  # 256-aligned packing (LCM of chunk 256 and 128)
    seq_idx = np.zeros(T, np.int32)
    in_pos = np.zeros(T, np.int32)
    valid = np.zeros(T, bool)
    for b, (s, L) in enumerate(zip(starts, lens)):
        seq_idx[s:s + L] = b
        in_pos[s:s + L] = np.arange(L)
        valid[s:s + L] = True
    q = jnp.asarray(rng.normal(size=(T, H * G, D)).astype(np.float32))
    k_pre = jnp.asarray(rng.normal(size=(T, H, D)).astype(np.float32))
    k_post = jnp.asarray(rng.normal(size=(T, H, D)).astype(np.float32))
    phi = make_phi(D, 16)
    args = (
        q, k_pre, k_post, phi, jnp.asarray(lens),
        jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid),
        jnp.asarray([2, 2]), jnp.asarray([4, 4]),
    )
    kw = dict(score_chunk_size=256, t_pad=T, b_pad=2, aligned=True)
    want = compactor_scores(*args, **kw)
    meta = make_chunk_meta_aligned(
        jnp.asarray(seq_idx), jnp.asarray(valid), POSTROPE_CHUNK
    )
    colmass = chunk_colmass(q, k_post, meta, POSTROPE_CHUNK, 1.0, aligned=True)
    got = compactor_scores(*args, **kw, postrope_colmass=colmass)
    vm = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(got)[vm], np.asarray(want)[vm], rtol=1e-4, atol=1e-4
    )


def test_snapkv_streaming_blocks_match_single_block():
    """The two-pass streaming LSE must be invariant to the key block size
    (block=max_q degenerates to the dense computation)."""
    rng = np.random.default_rng(11)
    T, H, G, D = 384, 2, 2, 16
    lens = np.array([200, 97], np.int32)
    starts = np.array([0, 208], np.int32)
    seq_idx = np.zeros(T, np.int32)
    in_pos = np.zeros(T, np.int32)
    valid = np.zeros(T, bool)
    for b in range(2):
        sl = slice(starts[b], starts[b] + lens[b])
        seq_idx[sl] = b
        in_pos[sl] = np.arange(lens[b])
        valid[sl] = True
    q = jnp.asarray(rng.normal(size=(T, H * G, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(T, H, D)).astype(np.float32))
    args = (
        q, k, jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(seq_idx),
        jnp.asarray(in_pos), jnp.asarray(valid),
        jnp.asarray([2, 2]), jnp.asarray([4, 4]),
    )
    dense = snapkv_scores(*args, max_q=256, key_block=256)
    streamed = snapkv_scores(*args, max_q=256, key_block=32)
    np.testing.assert_allclose(
        np.asarray(streamed)[valid], np.asarray(dense)[valid],
        rtol=2e-3, atol=1e-4,  # online LSE reorders fp sums across blocks
    )
