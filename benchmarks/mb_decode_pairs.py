"""Decode multi-pair A/B: pairs-per-program sweep across (ctx, batch).

VERDICT round-4 weak #7: the multi-pair-4 default was kept despite an
apparent 4096-ctx regression (1.85 vs 1.73 ms/layer) dismissed as wobble.
Note the selection math: at ctx 4096 the multi-pair resident kernel needs
2*pairs*slot_bytes VMEM (~2.6 MB/slot), so pairs>=2 exceeds the 8 MB ring
budget and selection FALLS BACK to the single-pair resident kernel — the
pairs knob is a no-op there, and any measured difference is noise. This
sweep proves that on chip (pairs rows at 4096 should coincide) and settles
whether pairs=4 helps or hurts where it genuinely engages (ctx <= 2048).

Also probes a raised ring budget (12 MB) at ctx 4096 / pairs 2, the only
larger-ctx multi-pair configuration that physically fits 16 MB VMEM.

Usage: python benchmarks/mb_decode_pairs.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import jax

from benchmarks.bench_kernels import bench_decode, log
from compactor_vllm_tpu.ops import tuning


def main():
    log(f"device: {jax.devices()[0].device_kind}")
    results = {}
    log(f"{'ctx':>6} {'batch':>6} {'pairs':>6} {'budget':>7} "
        f"{'ms/layer':>9} {'GB/s':>7}")
    for ctx, batch in [(1024, 64), (2048, 16), (2048, 64), (4096, 16)]:
        for pairs in (1, 2, 4):
            with tuning.override(decode_pairs=pairs):
                dt, bw = bench_decode(ctx, batch)
            log(f"{ctx:>6} {batch:>6} {pairs:>6} {'8MB':>7} "
                f"{dt*1e3:>9.3f} {bw:>7.0f}")
            results[f"ctx{ctx}_b{batch}_p{pairs}"] = round(dt * 1e3, 4)
    # The only >2048-ctx multi-pair shape that fits VMEM: pairs=2 at 12 MB.
    for pairs in (1, 2):
        with tuning.override(decode_pairs=pairs, ring_budget_bytes=12 << 20):
            dt, bw = bench_decode(4096, 16)
        log(f"{4096:>6} {16:>6} {pairs:>6} {'12MB':>7} "
            f"{dt*1e3:>9.3f} {bw:>7.0f}")
        results[f"ctx4096_b16_p{pairs}_12mb"] = round(dt * 1e3, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
