"""Token/logit parity of the functional transformer vs HF transformers
(tiny random-weight models, fp32, CPU) — the reference validates end-to-end
correctness only via eval harnesses; we add this stronger engine-level check
(SURVEY.md §4 implication)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from compactor_vllm_tpu.config import CompressionMethod
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import KVCacheGeometry, init_kv_cache
from compactor_vllm_tpu.models import spec_from_hf_config
from compactor_vllm_tpu.models.transformer import (
    CompressionStatic,
    DecodeMeta,
    PrefillMeta,
    forward,
    prefill_logits,
    compute_logits,
    reference_attention_impl,
)
from compactor_vllm_tpu.utils.weights import load_params


def tiny_llama_config():
    return transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )


def tiny_qwen3_config():
    return transformers.Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )


def build_runtime(spec, num_slots=4, max_len=64):
    geom = KVCacheGeometry(
        num_layers=spec.num_layers,
        num_pages=256,
        page_size=8,
        num_kv_heads=spec.num_kv_heads,
        head_dim=spec.head_dim,
        num_slots=num_slots,
        max_pages_per_head=max_len // 8,
    )
    alloc = PageAllocator(
        num_layers=geom.num_layers, num_shards=1, pages_per_shard=geom.num_pages,
        num_kv_heads=geom.num_kv_heads, max_pages_per_head=geom.max_pages_per_head,
        num_slots=num_slots, page_size=8,
    )
    cache = init_kv_cache(geom, dtype=jnp.float32)
    return geom, alloc, cache


def run_ours(hf_model, cfg, prompts, n_decode=8):
    """Prefill + greedy decode through our functional model; returns
    (prefill_logits [B, V], generated tokens [B, n_decode])."""
    spec = spec_from_hf_config(cfg)
    params = load_params(spec, dict(hf_model.state_dict()), dtype=jnp.float32)
    geom, alloc, cache = build_runtime(spec)
    attn = reference_attention_impl(
        max_cache_len_prefill=0,
        max_cache_len_decode=geom.max_pages_per_head * geom.page_size,
    )
    comp = CompressionStatic(method=CompressionMethod.NONE)

    B = len(prompts)
    lens = [len(p) for p in prompts]
    T = sum(lens)
    cu = np.zeros(B + 1, np.int32)
    cu[1:] = np.cumsum(lens)
    seq_idx = np.repeat(np.arange(B), lens).astype(np.int32)
    in_pos = np.concatenate([np.arange(l) for l in lens]).astype(np.int32)
    ids = np.concatenate(prompts).astype(np.int32)
    slots = []
    for i, l in enumerate(lens):
        alloc.alloc_slot(i)
        alloc.reserve(i, l + n_decode)
        slots.append(alloc.slot_of_seq[i])
    cache = cache._replace(page_table=jnp.asarray(alloc.page_table))
    meta = PrefillMeta(
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(in_pos),
        token_seq_idx=jnp.asarray(seq_idx),
        token_in_pos=jnp.asarray(in_pos),
        token_valid=jnp.ones(T, bool),
        seq_starts=jnp.asarray(cu[:-1]),
        seq_lens=jnp.asarray(np.diff(cu).astype(np.int32)),
        slots=jnp.asarray(np.array(slots, np.int32)),
        seq_valid=jnp.ones(B, bool),
        retain=jnp.zeros(B, jnp.int32),
        protected_first=jnp.zeros(B, jnp.int32),
        protected_last=jnp.zeros(B, jnp.int32),
        phi=jnp.zeros((spec.head_dim, 4), jnp.float32),
    )
    cache, hidden = forward(
        params, cache, meta, spec=spec, geom=geom, comp=comp, attn=attn,
        is_prefill=True, max_q=max(lens),
    )
    logits0 = prefill_logits(params, spec, hidden, meta.seq_starts, meta.seq_lens)

    tokens = np.argmax(np.asarray(logits0), axis=-1).astype(np.int32)
    generated = [tokens]
    positions = np.array(lens, np.int32)
    for _ in range(n_decode - 1):
        dmeta = DecodeMeta(
            input_ids=jnp.asarray(generated[-1]),
            positions=jnp.asarray(positions),
            slots=meta.slots,
            valid=jnp.ones(B, bool),
            contig8=jnp.zeros((B, spec.num_kv_heads, geom.max_pages_per_head // 8 + 1), jnp.int32),
        )
        cache, hidden = forward(
            params, cache, dmeta, spec=spec, geom=geom, comp=comp, attn=attn,
            is_prefill=False,
        )
        logits = compute_logits(params, spec, hidden)
        generated.append(np.argmax(np.asarray(logits), axis=-1).astype(np.int32))
        positions += 1
    return np.asarray(logits0), np.stack(generated, axis=1)


def run_hf(hf_model, prompts, n_decode=8):
    outs = []
    logits0 = []
    for p in prompts:
        ids = torch.tensor([p], dtype=torch.long)
        with torch.no_grad():
            gen = hf_model.generate(
                ids, max_new_tokens=n_decode, do_sample=False,
                pad_token_id=0, use_cache=True,
            )
            lg = hf_model(ids).logits[0, -1]
        outs.append(gen[0, len(p):].numpy())
        logits0.append(lg.numpy())
    return np.stack(logits0), np.stack(outs)


@pytest.mark.parametrize("make_cfg", [tiny_llama_config, tiny_qwen3_config])
def test_prefill_logits_and_greedy_decode_parity(make_cfg):
    torch.manual_seed(0)
    cfg = make_cfg()
    hf_model = transformers.AutoModelForCausalLM.from_config(cfg)
    hf_model.eval()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (11, 5, 17)]

    ours_logits, ours_tokens = run_ours(hf_model, cfg, prompts)
    hf_logits, hf_tokens = run_hf(hf_model, prompts)

    np.testing.assert_allclose(ours_logits, hf_logits, atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(ours_tokens, hf_tokens)


def tiny_qwen3_moe_config():
    return transformers.Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        moe_intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )


def tiny_llama31_config():
    """Llama-3.1-style rope_scaling (wavelength-banded frequency rescaling,
    reference: layers/rotary_embedding.py:34-60)."""
    return transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )


@pytest.mark.parametrize("make_cfg", [tiny_qwen3_moe_config, tiny_llama31_config])
def test_moe_and_rope_scaling_parity(make_cfg):
    torch.manual_seed(1)
    cfg = make_cfg()
    hf_model = transformers.AutoModelForCausalLM.from_config(cfg)
    hf_model.eval()
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (13, 7)]

    ours_logits, ours_tokens = run_ours(hf_model, cfg, prompts, n_decode=6)
    hf_logits, hf_tokens = run_hf(hf_model, prompts, n_decode=6)

    np.testing.assert_allclose(ours_logits, hf_logits, atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(ours_tokens, hf_tokens)


def tiny_qwen3_moe_mixed_config():
    """Mixed dense/MoE stack: layer 0 and 3 dense (mlp_only_layers +
    decoder_sparse_step), layers 1-2 MoE (reference qwen3_moe.py:214-230)."""
    return transformers.Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=112,
        moe_intermediate_size=48,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        norm_topk_prob=True,
        decoder_sparse_step=1,
        mlp_only_layers=[0, 3],
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )


def test_mixed_dense_moe_stack_parity():
    torch.manual_seed(2)
    cfg = tiny_qwen3_moe_mixed_config()
    from compactor_vllm_tpu.models import spec_from_hf_config as _s

    spec = _s(cfg)
    assert spec.is_mixed
    assert spec.segments == ((0, 1, False), (1, 3, True), (3, 4, False))
    hf_model = transformers.AutoModelForCausalLM.from_config(cfg)
    hf_model.eval()
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (12, 9)]

    ours_logits, ours_tokens = run_ours(hf_model, cfg, prompts, n_decode=6)
    hf_logits, hf_tokens = run_hf(hf_model, prompts, n_decode=6)

    np.testing.assert_allclose(ours_logits, hf_logits, atol=5e-4, rtol=1e-3)
    np.testing.assert_array_equal(ours_tokens, hf_tokens)


def test_load_params_dtype_preserving_bf16():
    """bf16 checkpoints stage in bf16 (no f32 intermediate) and round-trip
    bit-exactly through load_params (VERDICT r2 weak #5: an 8B load must not
    materialize a 32 GB f32 host tree)."""
    torch.manual_seed(1)
    cfg = tiny_llama_config()
    hf = transformers.AutoModelForCausalLM.from_config(cfg).to(torch.bfloat16)
    sd = dict(hf.state_dict())
    spec = spec_from_hf_config(cfg)
    params = load_params(spec, sd, dtype=jnp.bfloat16, device_put=False)
    assert params["layers"]["o_proj"].dtype == jnp.dtype(jnp.bfloat16)
    src = sd["model.layers.0.self_attn.o_proj.weight"]
    got = np.asarray(params["layers"]["o_proj"][0]).view(np.uint16)
    want = src.T.contiguous().view(torch.uint16).numpy()
    np.testing.assert_array_equal(got, want)
