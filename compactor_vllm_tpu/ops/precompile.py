"""AOT program warm-up CLI (reference: attention/compile_kernels.py:1-261).

The reference sweeps (cache_len, append_len) grids with mock paged caches to
populate the Triton autotune disk cache ahead of serving. The TPU analog:
run dummy workloads through the engine so every (prefill bucket, decode
bucket, compression config) program is compiled and stored in the persistent
XLA compilation cache (cfg.compilation_cache_dir) — later engine starts load
executables instead of compiling.

Usage:
  python -m compactor_vllm_tpu.ops.precompile \
      --model /path/to/model [--random-weights] \
      --max-length 40960 --methods none compactor snapkv
"""

from __future__ import annotations

import argparse
import logging
import time

logger = logging.getLogger(__name__)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="")
    ap.add_argument("--random-weights", action="store_true",
                    help="random-init params (compilation only needs shapes)")
    ap.add_argument("--max-length", type=int, default=8192)
    ap.add_argument("--max-num-seqs", type=int, default=32)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--methods", nargs="+", default=["none", "compactor"],
                    choices=["none", "compactor", "snapkv"])
    ap.add_argument("--prompt-lens", nargs="+", type=int,
                    default=[1024, 4096])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compactor_vllm_tpu import (
        BatchCompressionParams,
        CompressionMethod,
        LLMConfig,
        LLMEngine,
        SamplingParams,
        Sequence,
        SequenceCompressionParams,
    )

    cfg = LLMConfig(
        model="" if args.random_weights else args.model,
        max_model_len=args.max_length,
        max_num_seqs=args.max_num_seqs,
        tensor_parallel_size=args.tp,
    )
    if args.random_weights:
        from transformers import AutoConfig

        from compactor_vllm_tpu.models import spec_from_hf_config
        from compactor_vllm_tpu.models.transformer import init_params

        spec = spec_from_hf_config(AutoConfig.from_pretrained(args.model))
        params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        engine = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    else:
        engine = LLMEngine(cfg)

    rng = np.random.default_rng(0)
    for method in args.methods:
        bp = BatchCompressionParams(compression_method=CompressionMethod(method))
        for plen in args.prompt_lens:
            t0 = time.perf_counter()
            seqs = [
                Sequence(
                    prompt_token_ids=rng.integers(1, 1000, size=plen).tolist(),
                    sampling_params=SamplingParams(0.0, cfg.decode_loop_steps + 1),
                    compression_params=SequenceCompressionParams(
                        compression_ratio=0.5 if method != "none" else 1.0
                    ),
                )
                for _ in range(min(4, args.max_num_seqs))
            ]
            engine.generate_from_sequences(seqs, bp)
            logger.info(
                "compiled method=%s prompt_len=%d in %.1fs",
                method, plen, time.perf_counter() - t0,
            )
    print("precompile done; executables stored in the persistent XLA cache")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
