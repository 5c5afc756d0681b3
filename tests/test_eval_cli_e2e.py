"""Offline end-to-end runs of BOTH eval CLIs (VERDICT round-2 missing #1 /
next-step #4): datasets are synthetic, the tokenizer is a stub, but the
ENGINE and the full CLI loop (arg parsing -> per-ratio sweep -> generation ->
metric scoring -> JSON/JSONL outputs) are real — so the first real-weights
invocation is one command that has already executed.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu import LLMConfig, LLMEngine
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params


class StubTokenizer:
    """Deterministic word-hash tokenizer with the HF surface the CLIs use."""

    eos_token_id = 0

    def __init__(self, vocab=512):
        self.vocab = vocab

    def apply_chat_template(self, conv, tokenize=False,
                            continue_final_message=False, **kw):
        return "\n".join(m["content"] for m in conv)

    def __call__(self, text, add_special_tokens=True):
        ids = [1 + (hash(w) % (self.vocab - 2)) for w in text.split()]
        return {"input_ids": ids or [1]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"t{i}" for i in ids if i > 0)


def make_engine():
    spec = ModelSpec(
        model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=64, hidden_size=128, intermediate_size=256, vocab_size=512,
    )
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=256, max_num_batched_tokens=512,
        kvcache_page_size=8, num_kv_pages=512, eos=-1, seed=0,
        prefill_token_buckets=(512,), decode_batch_buckets=(4,),
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=StubTokenizer())
    return eng


def _ruler_rows(n=3):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        words = " ".join(f"w{rng.integers(0, 99)}" for _ in range(120))
        rows.append({
            "context": words,
            "question": f"What is needle {i}?",
            "answer_prefix": "The needle is",
            # Substring "t" always appears in the stub decode ("t123 t17
            # ...") so the string-match metric scores 1.0 — giving nonzero
            # averages so the retention_vs_full computation is exercised.
            "answer": ["t"],
            "max_new_tokens": 8,
            "task": "niah_single_1",
        })
    return rows


def test_eval_ruler_cli_end_to_end(tmp_path):
    from compactor_vllm_tpu.evaluate import eval_ruler

    engine = make_engine()
    rows = _ruler_rows()

    def fake_load_dataset(name, config, split=None):
        return rows

    out = str(tmp_path / "ruler")
    summary = eval_ruler.main(
        argv=[
            "--model", "stub", "--max-length", "256",
            "--ratio", "1.0", "0.5",
            "--tasks", "niah_single_1", "--num-samples", "3",
            "--output", out,
        ],
        engine=engine,
        load_dataset=fake_load_dataset,
    )
    assert set(summary["results"]) == {"1.0", "0.5"}
    for r in ("1.0", "0.5"):
        assert "niah_single_1" in summary["results"][r]["tasks"]
        assert "average" in summary["results"][r]
    # ratio-1.0 run present => retention computed for every ratio
    assert "retention_vs_full" in summary["results"]["0.5"]
    assert os.path.exists(os.path.join(out, "summary.json"))
    with open(os.path.join(out, "details.jsonl")) as f:
        details = [json.loads(l) for l in f]
    assert len(details) == 6  # 3 rows x 2 ratios
    assert {d["ratio"] for d in details} == {1.0, 0.5}


def test_eval_longbench_cli_end_to_end(tmp_path):
    from compactor_vllm_tpu.evaluate import eval_longbench

    engine = make_engine()
    rng = np.random.default_rng(1)
    rows = [
        {
            "context": " ".join(f"p{rng.integers(0, 99)}" for _ in range(100)),
            "input": f"question {i}",
            "answers": [f"answer-{i}"],
            "all_classes": None,
        }
        for i in range(2)
    ]

    def fake_load_dataset(name, config, split=None):
        return rows

    out = str(tmp_path / "longbench")
    summary = eval_longbench.main(
        argv=[
            "--model", "stub", "--max-length", "256",
            "--tasks", "hotpotqa", "--ratio", "0.5",
            "--num-samples", "2", "--output", out,
        ],
        engine=engine,
        load_dataset=fake_load_dataset,
    )
    assert "hotpotqa" in summary["tasks"]
    assert os.path.exists(os.path.join(out, "summary.json"))
    with open(os.path.join(out, "details.jsonl")) as f:
        assert len(f.readlines()) == 2
