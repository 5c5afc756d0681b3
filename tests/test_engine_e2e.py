"""Engine-level end-to-end tests: continuous batching + greedy parity vs HF,
and KV compression behavior (exact prefill, reduced cache, page reclaim)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from compactor_vllm_tpu import (
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    LLMEngine,
    SamplingParams,
    Sequence,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.models import spec_from_hf_config
from compactor_vllm_tpu.utils.weights import load_params


@pytest.fixture(scope="module")
def tiny_model():
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype=torch.float32,
    )
    hf = transformers.AutoModelForCausalLM.from_config(cfg)
    hf.eval()
    return cfg, hf


def make_engine(tiny_model, **cfg_kw):
    hf_cfg, hf = tiny_model
    spec = spec_from_hf_config(hf_cfg)
    params = load_params(spec, dict(hf.state_dict()), dtype=jnp.float32)
    defaults = dict(
        max_num_seqs=2, max_model_len=64, kvcache_page_size=8,
        num_kv_pages=512, eos=-100, dtype="float32",
        prefill_token_buckets=(32, 64, 128), decode_batch_buckets=(2,),
    )
    defaults.update(cfg_kw)
    cfg = LLMConfig(**defaults)
    return LLMEngine(cfg, spec=spec, params=params)


def hf_greedy(hf, prompt, n):
    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(ids, max_new_tokens=n, do_sample=False, pad_token_id=0)
    return out[0, len(prompt):].tolist()


def test_continuous_batching_greedy_parity(tiny_model):
    _, hf = tiny_model
    engine = make_engine(tiny_model)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (11, 5, 17, 3, 23)]
    n_new = 8
    seqs = [
        Sequence(p, sampling_params=SamplingParams(temperature=0.0, max_new_tokens=n_new))
        for p in prompts
    ]
    outs = engine.generate_from_sequences(seqs)
    # 5 sequences, max_num_seqs=2 -> multiple prefill/decode interleavings.
    for p, o in zip(prompts, outs):
        assert o.completion_token_ids == hf_greedy(hf, p, n_new)
    # all slots/pages returned
    assert engine.runner.alloc.num_free_slots == engine.cfg.max_num_seqs
    engine.runner.alloc.check_invariants()


def test_eos_stops_generation(tiny_model):
    _, hf = tiny_model
    engine = make_engine(tiny_model, eos=-100)
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 128, size=9).tolist()
    ref = hf_greedy(hf, prompt, 8)
    # pick a greedy token as "eos": generation must stop at its 1st occurrence
    engine.cfg.eos = ref[2]
    stop = ref.index(ref[2])
    seqs = [Sequence(prompt, sampling_params=SamplingParams(0.0, 8))]
    outs = engine.generate_from_sequences(seqs)
    assert outs[0].completion_token_ids == ref[: stop + 1]


@pytest.mark.parametrize("method", [CompressionMethod.COMPACTOR, CompressionMethod.SNAPKV])
def test_compression_exact_prefill_and_reclaim(tiny_model, method):
    """Prefill attention is exact (first sampled token matches HF even under
    compression — SURVEY.md §3.3 key insight) and the compressed cache retains
    ~ratio of (token, head) pairs with surplus pages reclaimed."""
    _, hf = tiny_model
    engine = make_engine(tiny_model)
    rng = np.random.default_rng(11)
    L = 48
    prompt = rng.integers(1, 128, size=L).tolist()
    cp = SequenceCompressionParams(
        compression_ratio=0.5, protected_first_tokens=2, protected_last_tokens=4
    )
    seq = Sequence(
        prompt,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=4),
        compression_params=cp,
    )
    bp = BatchCompressionParams(compression_method=method, chunk_size=16)
    free_before = engine.runner.alloc.min_free_pages()

    # capture retained lens right after the compressed prefill
    runner = engine.runner
    orig = runner.run_prefill

    captured = {}

    def capture(seqs_, bp_):
        out = orig(seqs_, bp_)
        slot = runner.alloc.slot_of_seq[seqs_[0].seq_id]
        captured["lens"] = np.asarray(runner.cache.bh_lens[:, slot])
        return out

    runner.run_prefill = capture
    outs = engine.generate_from_sequences([seq], batch_compression=bp)
    runner.run_prefill = orig

    ref = hf_greedy(hf, prompt, 4)
    assert outs[0].completion_token_ids[0] == ref[0], "compressed prefill must be exact"

    H = engine.spec.num_kv_heads
    budget = max(round(0.5 * (L - 2 - 4) * H), 1)
    lens = captured["lens"]  # [L_layers, H]
    page = engine.runner.cfg.kvcache_page_size
    # Pad-to-page top-up: every head's retained count is its joint-selection
    # count rounded UP to a page multiple (capped at the prompt length), so
    # the totals land in [budget, budget + H*(page-1)] and each head's count
    # is a page multiple unless the whole prompt is retained.
    totals = lens.sum(axis=-1)
    assert (totals >= budget).all(), (totals, budget)
    assert (totals <= budget + H * (page - 1)).all(), (totals, budget)
    assert ((lens % page == 0) | (lens == L)).all(), lens
    # head-sparse: per-head lens need not be uniform, but all <= prompt len
    assert (lens <= L).all()
    # pages were reclaimed and everything is eventually freed
    assert engine.runner.alloc.min_free_pages() == free_before
    engine.runner.alloc.check_invariants()


def test_mixed_compression_ratios_in_one_batch(tiny_model):
    engine = make_engine(tiny_model, max_num_seqs=4, decode_batch_buckets=(4,))
    rng = np.random.default_rng(5)
    seqs = []
    for ratio in (0.3, 1.0, 0.6, 0.9):
        seqs.append(
            Sequence(
                rng.integers(1, 128, size=40).tolist(),
                sampling_params=SamplingParams(0.0, 3),
                compression_params=SequenceCompressionParams(
                    compression_ratio=ratio,
                    protected_first_tokens=1,
                    protected_last_tokens=2,
                ),
            )
        )
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    outs = engine.generate_from_sequences(seqs, batch_compression=bp)
    for o in outs:
        assert len(o.completion_token_ids) == 3
    engine.runner.alloc.check_invariants()


def test_reference_backend_matches_pallas(tiny_model):
    """AttentionBackend.REFERENCE (the jnp oracle path, the reference's
    'alternate backend' analog, layers/attention.py:96-107) must produce the
    same greedy tokens as the Pallas path."""
    from compactor_vllm_tpu import AttentionBackend

    rng = np.random.default_rng(13)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (9, 14)]

    def run(backend):
        engine = make_engine(tiny_model, attention_backend=backend)
        seqs = [
            Sequence(p, sampling_params=SamplingParams(0.0, 6)) for p in prompts
        ]
        return [o.completion_token_ids for o in engine.generate_from_sequences(seqs)]

    assert run(AttentionBackend.REFERENCE) == run(AttentionBackend.PALLAS)


def test_sampling_temperature_nonzero(tiny_model):
    engine = make_engine(tiny_model)
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 128, size=12).tolist()
    seqs = [Sequence(prompt, sampling_params=SamplingParams(1.0, 16))]
    outs = engine.generate_from_sequences(seqs)
    assert len(outs[0].completion_token_ids) == 16
    assert all(0 <= t < 128 for t in outs[0].completion_token_ids)


def test_fp8_kv_cache_engine_runs_and_first_tokens_exact(tiny_model):
    """kv_cache_dtype=fp8: generation runs end-to-end; the FIRST sampled
    token per sequence is exact (fresh prefill attends this step's raw K/V,
    never the quantized cache), and decode stays finite/plausible."""
    hf, _ = tiny_model
    eng8 = make_engine(tiny_model, kv_cache_dtype="fp8")
    eng32 = make_engine(tiny_model)
    rng = np.random.default_rng(12)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (33, 17)]

    def gen(eng):
        seqs = [
            Sequence(p, sampling_params=SamplingParams(0.0, 6)) for p in prompts
        ]
        return eng.generate_from_sequences(seqs)

    o8, o32 = gen(eng8), gen(eng32)
    for a, b in zip(o8, o32):
        assert len(a.completion_token_ids) == 6
        assert a.completion_token_ids[0] == b.completion_token_ids[0]


def test_custom_registered_method_with_documented_signature(tiny_model):
    """The README extension recipe: a registered method with the plain 5-arg
    score signature (no postrope_colmass kwarg) must run end-to-end."""
    from compactor_vllm_tpu.compression import (
        COMPRESSION_REGISTRY,
        ScoringMethod,
        apply_protection,
        register_method,
    )

    def my_scores(q, k_prerope, k_postrope, meta, comp, *, t_pad, b_pad):
        scores = jnp.linalg.norm(k_postrope.astype(jnp.float32), axis=-1)
        return apply_protection(
            scores, meta.seq_lens, meta.token_seq_idx, meta.token_in_pos,
            meta.token_valid, meta.protected_first, meta.protected_last,
        )

    register_method("knorm_test", ScoringMethod(score=my_scores))
    try:
        eng = make_engine(tiny_model)
        rng = np.random.default_rng(8)
        seqs = [
            Sequence(
                rng.integers(1, 128, size=40).tolist(),
                sampling_params=SamplingParams(0.0, 4),
                compression_params=SequenceCompressionParams(
                    compression_ratio=0.5, protected_first_tokens=2,
                    protected_last_tokens=8,
                ),
            )
        ]
        outs = eng.generate_from_sequences(
            seqs,
            BatchCompressionParams(
                compression_method="knorm_test", chunk_size=16
            ),
        )
        assert len(outs[0].completion_token_ids) == 4
    finally:
        COMPRESSION_REGISTRY.pop("knorm_test", None)


@pytest.mark.parametrize("backend", ["pallas", "reference"])
def test_head_retention_cap_bounds_lens_and_reservation(tiny_model, backend):
    """Opt-in per-head retention cap (reclaim-aware admission): per-head
    retained lens never exceed the cap, admission reserves only cap+max_new
    pages per head (so a prompt that could NOT be admitted uncapped fits),
    and generation still completes."""
    from compactor_vllm_tpu.config import AttentionBackend

    hf_cfg, hf = tiny_model
    # Tiny pool: uncapped admission of a 160-token prompt needs
    # ceil(168/8)=21 pages/head; give the pool less than that per head.
    eng = make_engine(
        tiny_model, max_model_len=256, num_kv_pages=36,
        prefill_token_buckets=(256,),
        attention_backend=AttentionBackend(backend),
    )
    rng = np.random.default_rng(9)
    cp = SequenceCompressionParams(
        compression_ratio=0.25, protected_first_tokens=2,
        protected_last_tokens=8, max_head_retention_factor=1.5,
    )
    seq = Sequence(
        rng.integers(1, 128, size=160).tolist(),
        sampling_params=SamplingParams(0.0, 4),
        compression_params=cp,
    )
    cap = seq.head_retention_cap()
    assert 0 < cap < 160
    # Uncapped, this prompt cannot be admitted (pool too small).
    uncapped = Sequence(
        list(seq.prompt_token_ids),
        sampling_params=SamplingParams(0.0, 4),
        compression_params=SequenceCompressionParams(
            compression_ratio=0.25, protected_first_tokens=2,
            protected_last_tokens=8,
        ),
    )
    with pytest.raises(RuntimeError, match="stuck"):
        make_engine(
            tiny_model, max_model_len=256, num_kv_pages=36,
            prefill_token_buckets=(256,),
            attention_backend=AttentionBackend(backend),
        ).generate_from_sequences(
            [uncapped],
            BatchCompressionParams(
                compression_method=CompressionMethod.COMPACTOR, chunk_size=16
            ),
        )

    runner = eng.runner
    captured = {}
    orig = runner.run_prefill

    def capture(seqs_, bp_):
        out = orig(seqs_, bp_)
        slot = runner.alloc.slot_of_seq[seqs_[0].seq_id]
        captured["lens"] = np.asarray(runner.cache.bh_lens[:, slot])
        return out

    runner.run_prefill = capture
    outs = eng.generate_from_sequences(
        [seq],
        BatchCompressionParams(
            compression_method=CompressionMethod.COMPACTOR, chunk_size=16
        ),
    )
    runner.run_prefill = orig
    assert len(outs[0].completion_token_ids) == 4
    lens = captured["lens"]  # [L, H]
    assert (lens <= cap).all(), (lens.max(), cap)
    assert (lens > 0).all()
    eng.runner.alloc.check_invariants()


def test_fp8_kv_with_compression_runs(tiny_model):
    """fp8 KV composed with Compactor compression: the compressed store
    quantizes the selected rows; generation completes and the first sampled
    token stays exact (fresh prefill never reads the cache)."""
    eng8 = make_engine(tiny_model, kv_cache_dtype="fp8")
    eng32 = make_engine(tiny_model)
    rng = np.random.default_rng(13)
    prompt = rng.integers(1, 128, size=48).tolist()
    cp = SequenceCompressionParams(
        compression_ratio=0.5, protected_first_tokens=2,
        protected_last_tokens=8,
    )
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )

    def gen(eng):
        seqs = [Sequence(list(prompt), sampling_params=SamplingParams(0.0, 5),
                         compression_params=cp)]
        return eng.generate_from_sequences(seqs, bp)

    o8, o32 = gen(eng8), gen(eng32)
    assert len(o8[0].completion_token_ids) == 5
    assert o8[0].completion_token_ids[0] == o32[0].completion_token_ids[0]
    eng8.runner.alloc.check_invariants()
