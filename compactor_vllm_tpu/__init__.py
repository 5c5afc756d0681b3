"""compactor_vllm_tpu — TPU-native long-context LLM inference engine with
fused, training-free KV-cache compression.

Public API surface mirrors the reference engine
(reference: src/compactor_vllm/__init__.py:1-17).
"""

from compactor_vllm_tpu.config import (
    AttentionBackend,
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.engine import LLM, LLMEngine
from compactor_vllm_tpu.utils.sequence import Sequence

__all__ = [
    "LLM",
    "LLMEngine",
    "LLMConfig",
    "SamplingParams",
    "AttentionBackend",
    "CompressionMethod",
    "BatchCompressionParams",
    "SequenceCompressionParams",
    "Sequence",
]

__version__ = "0.1.0"
