"""Multi-host initialization (SURVEY.md §2.8 TPU-native equivalent).

The reference is single-host (NCCL over localhost, engine_config.py:87-89).
This engine scales past one host by construction: every host runs the same
SPMD program over a DCN-spanning mesh, the deterministic host-side scheduler
and allocator make identical decisions from identical inputs, and sampling
uses a shared PRNG key — so no control-plane broadcasts are needed as long
as every host receives the same request stream (e.g. host 0 broadcasts
request metadata once per generate call via
`jax.experimental.multihost_utils.broadcast_one_to_all`).

Usage (one process per host, standard JAX distributed env):

    from compactor_vllm_tpu.parallel import multihost
    multihost.initialize()                  # jax.distributed.initialize()
    cfg = LLMConfig(..., tensor_parallel_size=jax.device_count())
    # make_mesh() uses jax.devices(), which is global after initialize().
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the JAX process group across hosts (no-op if single host
    and no coordinator is configured)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "distributed initialized: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
    except Exception as e:
        logger.warning("jax.distributed.initialize skipped: %s", e)


def broadcast_requests(obj, is_source: bool | None = None):
    """Replicate host-side request metadata (token ids, params) from host 0 to
    every host, so all SPMD schedulers see the same inputs (the reference's
    NCCL pack broadcast analog, utils/arguments.py:212-239)."""
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return obj
    if is_source is None:
        is_source = jax.process_index() == 0
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # Length first (fixed-size), then the padded payload.
    n = multihost_utils.broadcast_one_to_all(
        np.array([payload.size], np.int64), is_source=is_source
    )
    buf = np.zeros(int(n[0]), np.uint8)
    if is_source:
        buf[: payload.size] = payload
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=is_source)
    return pickle.loads(buf.tobytes())
