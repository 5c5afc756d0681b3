"""End-to-end prefill STEP attribution on the chip.

Times the engine's actual compiled prefill program (forward + store +
sampling) at the headline bench shapes under three compression variants:

  none        — store_full, no scoring (the uncompressed floor)
  unfused     — Compactor scoring with the dense jnp postrope pass
  fused       — Compactor scoring with the in-kernel postrope column mass

The none->unfused delta is the total compression cost; unfused->fused is the
fused-scoring win. This is the measurement VERDICT item 1 asks to drive
(compression <= 15% of prefill wall time).

Usage: python benchmarks/bench_prefill_step.py [repeats] [only=NAME]

`only=NAME` runs a single variant (none / compactor_unfused / compactor_fused
/ dummy_score / score_select_no_store) and exits — one process per variant so
a TPU fault in one variant can't zero the others' measurements (the round-4
crash lost the whole run).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.config import (
    AttentionBackend,
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.runner import ModelRunner
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence

PROMPT, B = 4096, 4  # one 16K-token bench batch


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("only=")]
    only = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("only=")),
        None,
    )
    repeats = int(args[0]) if args else 4
    spec = ModelSpec(
        model_type="qwen3", num_layers=28, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=2048, intermediate_size=6144,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    cfg = LLMConfig(
        max_num_seqs=8, max_model_len=PROMPT + 192,
        max_num_batched_tokens=16384, kvcache_page_size=64,
        num_kv_pages=2600, eos=-1, prefill_token_buckets=(16384,),
    )
    log(f"device: {jax.devices()[0].device_kind}")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = ModelRunner(cfg, spec, params)

    rng = np.random.default_rng(0)
    results = {}

    def run_variant(name, bp, force_fused=None):
        # The jit cache keys on CompressionStatic, which cannot see the
        # registry/impl monkeypatches of the isolation variants.
        runner._fn_cache.clear()
        seqs = [
            Sequence(
                prompt_token_ids=rng.integers(1, 50_000, size=PROMPT).tolist(),
                sampling_params=SamplingParams(temperature=0.0, max_new_tokens=64),
                compression_params=SequenceCompressionParams(
                    compression_ratio=0.5, protected_first_tokens=16,
                    protected_last_tokens=64,
                ),
            )
            for _ in range(B)
        ]
        for gi, s in enumerate(seqs):
            runner.allocs[0].alloc_slot(s.seq_id)
            runner.allocs[0].reserve(s.seq_id, PROMPT + 64)
        runner.sync_page_table(
            [type("U", (), {"slot": runner.allocs[0].slot_of_seq[s.seq_id]})()
             for s in seqs]
        )
        if force_fused is not None:
            orig = ModelRunner._comp_static

            def patched(self, bp_, seqs_):
                comp = orig(self, bp_, seqs_)
                from dataclasses import replace
                return replace(comp, fused_postrope=force_fused)

            ModelRunner._comp_static = patched
        try:
            # Warmup (compile) + timed repeats; the cache pytree is donated, so
            # chain the returned cache through calls.
            def reset():
                for s in seqs:
                    s.num_prefilled_tokens = 0

            t0 = time.perf_counter()
            runner.run_prefill(seqs, bp)
            jax.block_until_ready(runner.cache.bh_lens)
            log(f"  {name}: warmup {time.perf_counter() - t0:.1f}s")
            ts = []
            for _ in range(repeats):
                reset()
                t0 = time.perf_counter()
                runner.run_prefill(seqs, bp)
                jax.block_until_ready(runner.cache.bh_lens)
                ts.append(time.perf_counter() - t0)
        finally:
            if force_fused is not None:
                ModelRunner._comp_static = orig
            for s in seqs:
                runner.allocs[0].release_slot(s.seq_id)
        dt = float(np.median(ts))
        log(f"  {name}: {dt * 1e3:.1f} ms/step ({B * PROMPT / dt:.0f} tok/s)")
        results[name] = dt * 1e3
        return dt

    def v_none():
        run_variant("none", BatchCompressionParams(CompressionMethod.NONE))

    def v_unfused():
        run_variant(
            "compactor_unfused",
            BatchCompressionParams(CompressionMethod.COMPACTOR),
            force_fused=False,
        )

    def v_fused():
        run_variant(
            "compactor_fused",
            BatchCompressionParams(CompressionMethod.COMPACTOR),
            force_fused=True,
        )

    def v_dummy():
        # dummy scoring: trivial [T, H] scores -> isolates select + store + glue.
        from compactor_vllm_tpu.compression import (
            COMPRESSION_REGISTRY,
            ScoringMethod,
        )

        def dummy_score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                        postrope_colmass=None):
            return k_post[:, :, 0].astype(jnp.float32)

        orig_m = COMPRESSION_REGISTRY["compactor"]
        COMPRESSION_REGISTRY["compactor"] = ScoringMethod(score=dummy_score)
        try:
            run_variant(
                "dummy_score",
                BatchCompressionParams(CompressionMethod.COMPACTOR),
            )
        finally:
            COMPRESSION_REGISTRY["compactor"] = orig_m

    def v_dummy_fused():
        # trivial scoring WITH the scored attention kernel (colmass computed
        # and discarded) -> isolates the scored-kernel delta from the jnp
        # scoring glue: fused - dummy_fused = leverage + z-scores +
        # protection; dummy_fused - dummy = in-kernel chunk scoring cost.
        from compactor_vllm_tpu.compression import (
            COMPRESSION_REGISTRY,
            ScoringMethod,
        )

        def dummy_score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                        postrope_colmass=None):
            return k_post[:, :, 0].astype(jnp.float32)

        orig_m = COMPRESSION_REGISTRY["compactor"]
        COMPRESSION_REGISTRY["compactor"] = ScoringMethod(score=dummy_score)
        try:
            run_variant(
                "dummy_fused",
                BatchCompressionParams(CompressionMethod.COMPACTOR),
                force_fused=True,
            )
        finally:
            COMPRESSION_REGISTRY["compactor"] = orig_m

    def _register_and_run(name, score_fn, wants_colmass):
        from compactor_vllm_tpu.compression import (
            COMPRESSION_REGISTRY,
            ScoringMethod,
        )

        orig_m = COMPRESSION_REGISTRY["compactor"]
        COMPRESSION_REGISTRY["compactor"] = ScoringMethod(
            score=score_fn, wants_postrope_colmass=wants_colmass
        )
        try:
            run_variant(
                name,
                BatchCompressionParams(CompressionMethod.COMPACTOR),
                force_fused=True,
            )
        finally:
            COMPRESSION_REGISTRY["compactor"] = orig_m

    def v_post_only():
        # scoring = fused colmass + per-seq z-score + protection only (no
        # leverage): post_only - dummy_fused = in-program colmass-glue cost.
        from compactor_vllm_tpu.compression.chunking import zscore_aligned
        from compactor_vllm_tpu.compression.compactor import (
            POSTROPE_CHUNK,
            apply_protection,
        )

        def score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
            cm = jnp.where(
                meta.token_valid[:, None], postrope_colmass, 0.0
            )
            post = zscore_aligned(
                cm, meta.token_seq_idx, meta.token_valid, POSTROPE_CHUNK,
                "seq", num_seqs=meta.seq_lens.shape[0],
            )
            return apply_protection(
                post, meta.seq_lens, meta.token_seq_idx, meta.token_in_pos,
                meta.token_valid, meta.protected_first, meta.protected_last,
            )

        _register_and_run("post_only", score, wants_colmass=True)

    def v_post_raw():
        # raw fused colmass only (valid-masked; NO z-score, NO protection):
        # post_raw - dummy_fused = cost of consuming the kernel's score
        # output (the [H, T] -> [T, H] transpose + mask).
        def score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
            return jnp.where(
                meta.token_valid[:, None], postrope_colmass, -1.0e30
            )

        _register_and_run("post_raw", score, wants_colmass=True)

    def v_post_prot():
        # raw colmass + protection (no z-score): isolates apply_protection's
        # per-token [T]-from-[Bp] gathers.
        from compactor_vllm_tpu.compression.compactor import apply_protection

        def score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
            cm = jnp.where(meta.token_valid[:, None], postrope_colmass, 0.0)
            return apply_protection(
                cm, meta.seq_lens, meta.token_seq_idx, meta.token_in_pos,
                meta.token_valid, meta.protected_first, meta.protected_last,
            )

        _register_and_run("post_prot", score, wants_colmass=True)

    def v_lev_only():
        # scoring = pre-RoPE leverage + protection only (fused kernel still
        # computes+discards colmass): lev_only - dummy_fused = in-program
        # leverage cost.
        from compactor_vllm_tpu.compression.chunking import (
            make_chunk_meta_aligned,
        )
        from compactor_vllm_tpu.compression.compactor import (
            apply_protection,
            approximate_leverage_scores,
        )

        def score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
            meta_pre = make_chunk_meta_aligned(
                meta.token_seq_idx, meta.token_valid, comp.chunk_size
            )
            pre = approximate_leverage_scores(
                k_pre, meta.phi, meta_pre, comp.chunk_size, aligned=True,
                token_valid=meta.token_valid,
            )
            return apply_protection(
                pre, meta.seq_lens, meta.token_seq_idx, meta.token_in_pos,
                meta.token_valid, meta.protected_first, meta.protected_last,
            )

        _register_and_run("lev_only", score, wants_colmass=True)

    def v_lev_nosolve():
        # leverage WITHOUT the Cholesky + triangular solve (scores = squared
        # row norms of the centered sketch): lev_only - lev_nosolve = the
        # in-program decomposition cost; lev_nosolve - dummy_fused = the
        # sketch/center/einsum/z-score data-path cost.
        from compactor_vllm_tpu.compression.chunking import (
            chunk_row_mask,
            make_chunk_meta_aligned,
            scatter_to_chunks,
            zscore_aligned,
        )
        from compactor_vllm_tpu.compression.compactor import apply_protection

        def score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
            mt = make_chunk_meta_aligned(
                meta.token_seq_idx, meta.token_valid, comp.chunk_size
            )
            X = jnp.einsum(
                "thd,ds->ths", k_pre.astype(jnp.float32), meta.phi,
                preferred_element_type=jnp.float32,
            )
            Xc = scatter_to_chunks(X, mt, comp.chunk_size, True)
            row_mask = chunk_row_mask(mt, comp.chunk_size)
            Xc = jnp.where(row_mask[:, :, None, None], Xc, 0.0)
            cnt = jnp.maximum(
                mt.chunk_valid_count.astype(jnp.float32), 1.0
            )[:, None, None]
            mean = Xc.sum(axis=1) / cnt
            Xc = jnp.where(row_mask[:, :, None, None], Xc - mean[:, None], 0.0)
            sc = jnp.einsum("nchs->nch", Xc * Xc)
            pre = zscore_aligned(
                sc.reshape(t_pad, k_pre.shape[1]), None, meta.token_valid,
                comp.chunk_size, "chunk",
            )
            return apply_protection(
                pre, meta.seq_lens, meta.token_seq_idx, meta.token_in_pos,
                meta.token_valid, meta.protected_first, meta.protected_last,
            )

        _register_and_run("lev_nosolve", score, wants_colmass=True)

    def v_nostore():
        # store probe: real scoring + threshold selection, but the fused
        # compact store is replaced by a full store plus a data dependency
        # that keeps the selection alive -> isolates the compact+store cost.
        attn = runner.attn
        orig_store = attn.store_sel

        def store_probe(geom, cache, layer, k, v, sel, meta, cached_ph=None):
            cache = attn.store_full(geom, cache, layer, k, v, meta)
            keep = jnp.minimum(
                sel.rank.max() + sel.counts.sum(), 0
            ).astype(jnp.int32)
            return cache._replace(bh_lens=cache.bh_lens + keep)

        object.__setattr__(attn, "store_sel", store_probe)
        try:
            run_variant(
                "score_select_no_store",
                BatchCompressionParams(CompressionMethod.COMPACTOR),
                force_fused=True,
            )
        finally:
            object.__setattr__(attn, "store_sel", orig_store)

    variants = {
        "none": v_none,
        "compactor_unfused": v_unfused,
        "compactor_fused": v_fused,
        "dummy_score": v_dummy,
        "dummy_fused": v_dummy_fused,
        "post_only": v_post_only,
        "post_raw": v_post_raw,
        "post_prot": v_post_prot,
        "lev_only": v_lev_only,
        "lev_nosolve": v_lev_nosolve,
        "score_select_no_store": v_nostore,
    }
    log("compiling + timing variants...")
    if only is not None:
        variants[only]()
    else:
        for fn in variants.values():
            fn()
        base = results["none"]
        for k in ("compactor_unfused", "compactor_fused"):
            results[f"{k}_overhead_pct"] = (
                100.0 * (results[k] - base) / results[k]
            )
            log(f"  {k}: compression = "
                f"{results[f'{k}_overhead_pct']:.1f}% of step")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
