"""Model registry keyed by HF config `model_type`
(reference: models/__init__.py:5-9)."""

from __future__ import annotations

from compactor_vllm_tpu.models.transformer import ModelSpec


def _rope_scaling_tuple(cfg) -> tuple:
    rs = getattr(cfg, "rope_scaling", None)
    if not rs:
        return ()
    return tuple(sorted((k, v) for k, v in rs.items() if not isinstance(v, (dict, list))))


def spec_from_llama(cfg) -> ModelSpec:
    """Llama 3 family (reference: models/llama3.py:28-281)."""
    return ModelSpec(
        model_type="llama",
        num_layers=cfg.num_hidden_layers,
        num_q_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        vocab_size=cfg.vocab_size,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=_rope_scaling_tuple(cfg),
        use_qk_norm=False,
        tie_word_embeddings=getattr(cfg, "tie_word_embeddings", False),
    )


def spec_from_qwen3(cfg) -> ModelSpec:
    """Qwen3 dense: llama skeleton + per-head q/k RMSNorm
    (reference: models/qwen3.py:79-97)."""
    return ModelSpec(
        model_type="qwen3",
        num_layers=cfg.num_hidden_layers,
        num_q_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        vocab_size=cfg.vocab_size,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=_rope_scaling_tuple(cfg),
        use_qk_norm=True,
        tie_word_embeddings=getattr(cfg, "tie_word_embeddings", False),
    )


def spec_from_qwen3_moe(cfg) -> ModelSpec:
    """Qwen3-MoE (reference: models/qwen3_moe.py:34-378), including mixed
    dense/MoE stacks (mlp_only_layers / decoder_sparse_step,
    qwen3_moe.py:214-230): the decoder scans each contiguous same-kind layer
    run separately."""
    return ModelSpec(
        model_type="qwen3_moe",
        num_layers=cfg.num_hidden_layers,
        num_q_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        head_dim=getattr(cfg, "head_dim", None)
        or cfg.hidden_size // cfg.num_attention_heads,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        vocab_size=cfg.vocab_size,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        rope_scaling=_rope_scaling_tuple(cfg),
        use_qk_norm=True,
        tie_word_embeddings=getattr(cfg, "tie_word_embeddings", False),
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        moe_intermediate_size=cfg.moe_intermediate_size,
        norm_topk_prob=getattr(cfg, "norm_topk_prob", True),
        mlp_only_layers=tuple(getattr(cfg, "mlp_only_layers", ()) or ()),
        decoder_sparse_step=getattr(cfg, "decoder_sparse_step", 1) or 1,
    )


MODEL_REGISTRY = {
    "llama": spec_from_llama,
    "qwen3": spec_from_qwen3,
    "qwen3_moe": spec_from_qwen3_moe,
}


def spec_from_hf_config(cfg) -> ModelSpec:
    mt = cfg.model_type
    if mt not in MODEL_REGISTRY:
        raise ValueError(
            f"unsupported model_type {mt!r}; supported: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[mt](cfg)
