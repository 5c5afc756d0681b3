"""LLMEngine / LLM: the public entry point.

Capability parity with reference core/llm_engine.py:22-294: tokenize prompts
(HF tokenizer, chat templates), build Sequences with per-sequence sampling and
compression params, clamp compression when protected regions cover the whole
prompt, run the continuous-batching loop, detokenize. No worker processes:
the TPU engine is SPMD — parallelism lives inside the compiled programs.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass

import jax.numpy as jnp

from compactor_vllm_tpu.config import (
    BatchCompressionParams,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.runner import ModelRunner
from compactor_vllm_tpu.models import spec_from_hf_config
from compactor_vllm_tpu.models.transformer import ModelSpec
from compactor_vllm_tpu.utils.sequence import Sequence
from compactor_vllm_tpu.utils.weights import load_params

logger = logging.getLogger(__name__)


@dataclass
class GenerationOutput:
    seq: Sequence
    completion_token_ids: list[int]
    text: str | None = None


class LLMEngine:
    def __init__(
        self,
        cfg: LLMConfig,
        *,
        spec: ModelSpec | None = None,
        params=None,
        tokenizer=None,
        runner: ModelRunner | None = None,
    ):
        self.cfg = cfg
        if cfg.model and not cfg.model_path and not os.path.isdir(cfg.model):
            # Resolve an HF hub id to the local snapshot (never downloads,
            # reference: core/llm_engine.py:41-47 local_files_only=True).
            try:
                from huggingface_hub import snapshot_download

                cfg.model_path = snapshot_download(cfg.model, local_files_only=True)
            except Exception as e:
                raise ValueError(
                    f"model {cfg.model!r} is not a local directory and no "
                    f"local HF snapshot exists ({e})"
                ) from None
        if spec is None:
            from transformers import AutoConfig

            hf_cfg = AutoConfig.from_pretrained(cfg.model_path or cfg.model)
            spec = spec_from_hf_config(hf_cfg)
            max_pos = getattr(hf_cfg, "max_position_embeddings", cfg.max_model_len)
            if cfg.max_model_len > max_pos:
                logger.warning(
                    "clamping max_model_len %d -> model max %d", cfg.max_model_len, max_pos
                )
                cfg.max_model_len = max_pos
        self.spec = spec
        dtype = jnp.dtype(cfg.dtype)
        if params is None:
            path = cfg.model_path or cfg.model
            if path and os.path.isdir(path):
                logger.info("loading weights from %s", path)
                params = load_params(spec, path, dtype=dtype)
            else:
                raise ValueError(
                    "no weights found; pass params= or set model_path to a "
                    "safetensors checkpoint directory"
                )
        self.tokenizer = tokenizer
        if tokenizer is None and cfg.model and os.path.isdir(cfg.model_path or cfg.model):
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(cfg.model_path or cfg.model)
            except Exception:
                logger.warning("no tokenizer available; text APIs disabled")
        if self.tokenizer is not None and cfg.eos == -1:
            cfg.eos = self.tokenizer.eos_token_id
        kv_dtypes = {
            "auto": dtype,
            "fp8": jnp.float8_e4m3fn,
            "float8_e4m3": jnp.float8_e4m3fn,
        }
        if cfg.kv_cache_dtype not in kv_dtypes:
            raise ValueError(
                f"kv_cache_dtype={cfg.kv_cache_dtype!r} not supported; "
                f"accepted values: {sorted(kv_dtypes)}"
            )
        kv_dtype = kv_dtypes[cfg.kv_cache_dtype]
        self.runner = runner or ModelRunner(
            cfg, spec, params, cache_dtype=kv_dtype
        )

    # ----------------------------------------------------------------- public

    def generate_from_sequences(
        self,
        seqs: list[Sequence],
        batch_compression: BatchCompressionParams | None = None,
        progress: bool = False,
    ) -> list[GenerationOutput]:
        bp = batch_compression or BatchCompressionParams()
        import jax

        if jax.process_count() > 1:
            # Multi-host SPMD: every host must see the identical request
            # stream so its deterministic scheduler/allocator make the same
            # decisions (reference analog: NCCL pack broadcast,
            # utils/arguments.py:212-239). Host 0 is the source of truth.
            from compactor_vllm_tpu.parallel import multihost

            seqs = multihost.broadcast_requests(seqs)
        for s in seqs:
            s.clamp_compression_if_protected()
        t0 = time.perf_counter()
        self.last_stats = self.runner.generate(seqs, bp, progress=progress)
        dt = time.perf_counter() - t0
        total = sum(s.num_tokens for s in seqs)
        logger.info(
            "generated %d seqs, %d tokens in %.2fs (%.0f tok/s)",
            len(seqs), total, dt, total / max(dt, 1e-9),
        )
        return [
            GenerationOutput(seq=s, completion_token_ids=list(s.completion_token_ids))
            for s in seqs
        ]

    def generate(
        self,
        prompts: list[str],
        sampling_params: SamplingParams | list[SamplingParams] | None = None,
        batch_compression: BatchCompressionParams | None = None,
        compression_params: SequenceCompressionParams | list[SequenceCompressionParams] | None = None,
    ) -> list[GenerationOutput]:
        assert self.tokenizer is not None, "text API requires a tokenizer"
        sp = self._broadcast(sampling_params or SamplingParams(), len(prompts))
        cp = self._broadcast(
            compression_params or SequenceCompressionParams(), len(prompts)
        )
        seqs = [
            Sequence(
                prompt_token_ids=self.tokenizer(p, add_special_tokens=True)["input_ids"],
                sampling_params=s,
                compression_params=c,
            )
            for p, s, c in zip(prompts, sp, cp)
        ]
        outs = self.generate_from_sequences(seqs, batch_compression)
        for o in outs:
            ids = o.completion_token_ids
            if ids and ids[-1] == self.cfg.eos:
                ids = ids[:-1]
            o.text = self.tokenizer.decode(ids, skip_special_tokens=True)
        return outs

    def generate_chat(
        self,
        conversations: list[list[dict]],
        sampling_params=None,
        batch_compression=None,
        compression_params=None,
        continue_final_message: bool = False,
    ) -> list[GenerationOutput]:
        """Chat-template entry (reference: core/llm_engine.py:213-276)."""
        assert self.tokenizer is not None, "chat API requires a tokenizer"
        prompts = [
            self.tokenizer.apply_chat_template(
                conv,
                tokenize=False,
                add_generation_prompt=not continue_final_message,
                continue_final_message=continue_final_message,
            )
            for conv in conversations
        ]
        sp = self._broadcast(sampling_params or SamplingParams(), len(prompts))
        cp = self._broadcast(
            compression_params or SequenceCompressionParams(), len(prompts)
        )
        seqs = [
            Sequence(
                prompt_token_ids=self.tokenizer(p, add_special_tokens=False)["input_ids"],
                sampling_params=s,
                compression_params=c,
            )
            for p, s, c in zip(prompts, sp, cp)
        ]
        outs = self.generate_from_sequences(seqs, batch_compression)
        for o in outs:
            ids = o.completion_token_ids
            if ids and ids[-1] == self.cfg.eos:
                ids = ids[:-1]
            o.text = self.tokenizer.decode(ids, skip_special_tokens=True)
        return outs

    @staticmethod
    def _broadcast(x, n):
        return x if isinstance(x, list) else [x] * n


class LLM(LLMEngine):
    """Public alias (reference: src/compactor_vllm/__init__.py:7)."""
