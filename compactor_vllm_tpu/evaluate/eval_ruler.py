"""RULER evaluation CLI (reference: evaluate/eval_ruler.py:1-377).

Loads `simonjegou/ruler` from the HF hub (or a local dataset path), builds
chat prompts with `continue_final_message`, protects the trailing question
span from compression (per-example protected_last = |answer_prefix +
question| + 16, reference eval_ruler.py:252-267), generates with the engine,
and scores with string-match metrics. Writes a JSON summary and a JSONL of
per-example details.

Usage (multi-ratio sweep in one run — the north-star table of
README.md:52-57 comes from `--ratio 1.0 0.75 0.5 0.25`):
  python -m compactor_vllm_tpu.evaluate.eval_ruler \
      --model /path/to/Qwen3-8B --max-length 4096 \
      --ratio 1.0 0.75 0.5 0.25 \
      --tasks niah_single_1 niah_multikey_1 --output ruler_out
"""

from __future__ import annotations

import argparse
import json
import logging
import os

logger = logging.getLogger(__name__)

# Tasks scored with string_match_all (multi-needle); the rest use _part.
MATCH_ALL_TASKS = {
    "niah_multikey_1", "niah_multikey_2", "niah_multikey_3",
    "niah_multiquery", "niah_multivalue", "vt", "cwe", "fwe",
}

DEFAULT_TASKS = [
    "niah_single_1", "niah_single_2", "niah_single_3",
    "niah_multikey_1", "niah_multikey_2", "niah_multikey_3",
    "niah_multiquery", "niah_multivalue",
    "vt", "cwe", "fwe", "qa_1", "qa_2",
]


def build_sequences(engine, rows, compression_ratio, protected_first):
    """Tokenize RULER rows into Sequences with per-example protection."""
    from compactor_vllm_tpu import SamplingParams, Sequence, SequenceCompressionParams

    tok = engine.tokenizer
    seqs, metas = [], []
    for row in rows:
        context = row["context"] if "context" in row else row["input"]
        question = row.get("question", "")
        answer_prefix = row.get("answer_prefix", "")
        conv = [
            {"role": "user", "content": context + ("\n" + question if question else "")},
            {"role": "assistant", "content": answer_prefix},
        ]
        prompt = tok.apply_chat_template(
            conv, tokenize=False, continue_final_message=True
        )
        ids = tok(prompt, add_special_tokens=False)["input_ids"]
        # Never compress the question/answer-prefix span (reference
        # eval_ruler.py:252-267).
        tail = tok(answer_prefix + question, add_special_tokens=False)["input_ids"]
        protected_last = len(tail) + 16
        seqs.append(
            Sequence(
                prompt_token_ids=ids,
                sampling_params=SamplingParams(
                    temperature=0.0,
                    max_new_tokens=int(row.get("max_new_tokens", 128)),
                ),
                compression_params=SequenceCompressionParams(
                    compression_ratio=compression_ratio,
                    protected_first_tokens=protected_first,
                    protected_last_tokens=protected_last,
                ),
            )
        )
        metas.append(row)
    return seqs, metas


def run_task(engine, dataset, task, args, ratio):
    from compactor_vllm_tpu import BatchCompressionParams
    from compactor_vllm_tpu.evaluate.ruler_metrics import (
        string_match_all,
        string_match_part,
    )

    rows = [r for r in dataset if r.get("task", task) == task]
    if args.num_samples:
        rows = rows[: args.num_samples]
    if not rows:
        logger.warning("task %s: no rows", task)
        return None, []
    seqs, metas = build_sequences(engine, rows, ratio, args.protected_first)
    method = args.method if ratio < 1.0 else "none"
    bp = BatchCompressionParams(
        compression_method=method, chunk_size=args.chunk_size
    )
    outs = engine.generate_from_sequences(seqs, batch_compression=bp)
    metric = string_match_all if task in MATCH_ALL_TASKS else string_match_part
    details, total = [], 0.0
    for row, out in zip(metas, outs):
        pred = engine.tokenizer.decode(
            out.completion_token_ids, skip_special_tokens=True
        )
        refs = row["answer"] if isinstance(row["answer"], list) else [row["answer"]]
        s = metric(pred, refs)
        total += s
        details.append({"task": task, "pred": pred, "refs": refs, "score": s})
    return total / len(rows) * 100.0, details


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--dataset", default="simonjegou/ruler",
                    help="HF dataset name or local path")
    ap.add_argument("--max-length", type=int, default=4096)
    ap.add_argument("--tasks", nargs="+", default=DEFAULT_TASKS)
    ap.add_argument("--ratio", type=float, nargs="+", default=[0.5],
                    help="fraction(s) of (token, head) pairs retained — pass "
                    "several (e.g. 1.0 0.75 0.5 0.25) for the north-star "
                    "retention sweep in one run; 1.0 disables compression")
    ap.add_argument("--method", default="compactor",
                    choices=["none", "compactor", "snapkv"])
    ap.add_argument("--chunk-size", type=int, default=512)
    ap.add_argument("--protected-first", type=int, default=16)
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--max-num-seqs", type=int, default=32)
    ap.add_argument("--output", default="ruler_results")
    return ap.parse_args(argv)


def run(args, engine=None, load_dataset=None):
    """Evaluation loop; `engine`/`load_dataset` injectable so the offline
    end-to-end test (tests/test_eval_cli_e2e.py) drives the REAL loop with a
    tiny model and a synthetic dataset."""
    from compactor_vllm_tpu import CompressionMethod, LLM, LLMConfig

    args.method = CompressionMethod(args.method)
    if engine is None:
        cfg = LLMConfig(
            model=args.model,
            max_model_len=args.max_length + 256,
            max_num_seqs=args.max_num_seqs,
            tensor_parallel_size=args.tp,
        )
        engine = LLM(cfg)
    if load_dataset is None:
        from datasets import load_dataset

    os.makedirs(args.output, exist_ok=True)
    summary = {
        "model": args.model, "ratios": args.ratio,
        "method": args.method.value, "max_length": args.max_length,
        "results": {},
    }
    with open(os.path.join(args.output, "details.jsonl"), "w") as detf:
        for ratio in args.ratio:
            per_task = {}
            for task in args.tasks:
                try:
                    ds = load_dataset(
                        args.dataset, f"{args.max_length}", split=task
                    )
                except Exception:
                    ds = load_dataset(
                        args.dataset, f"{args.max_length}", split="test"
                    )
                score, details = run_task(engine, ds, task, args, ratio)
                if score is None:
                    continue
                per_task[task] = score
                logger.info("ratio %.2f %s: %.2f", ratio, task, score)
                for d in details:
                    d["ratio"] = ratio
                    detf.write(json.dumps(d) + "\n")
            entry = {"tasks": per_task}
            if per_task:
                entry["average"] = sum(per_task.values()) / len(per_task)
            summary["results"][str(ratio)] = entry
    # Retention vs the uncompressed run when the sweep includes ratio 1.0
    # (the reference's >=97%-at-50% target, README.md:57).
    full = summary["results"].get("1.0", {}).get("average")
    if full:
        for r, entry in summary["results"].items():
            if "average" in entry and full > 0:
                entry["retention_vs_full"] = entry["average"] / full
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


def main(argv=None, engine=None, load_dataset=None):
    return run(parse_args(argv), engine=engine, load_dataset=load_dataset)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
