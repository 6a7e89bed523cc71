"""Multi-host coordination: file sharding and the call-table all-gather.

Reference: **none** — the reference is strictly single-process (SURVEY.md §2
distributed-comm row).  This module is the rebuild's one real collective:

1. every process takes a deterministic shard of the *sorted* fast5 list
   (stride by process index — identical on every host by construction);
2. after classifying, per-shard (read_id, call) tables are serialised to
   fixed-size padded byte tensors and all-gathered across hosts (ICI/DCN via
   ``jax.experimental.multihost_utils``);
3. every host deterministically merges + sorts the union, so host 0's
   printed table — and therefore `bin`'s FASTQ output — is byte-identical
   to a single-host run (the north-star invariant).

Single-process runs short-circuit every collective, so the same code path
serves laptop and pod.  For tests, ``DEEPBINNER_TPU_PROCESS_INDEX/COUNT``
env vars simulate the sharding arithmetic without a real multi-process setup
(SURVEY.md §4 item 4).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np


def maybe_initialize() -> None:
    """Initialise jax.distributed when launched as part of a multi-host job.

    Uses the standard coordinator env vars; harmless no-op otherwise.  Call
    before any other JAX API (reference analog: TF env setup before the
    keras import, SURVEY.md §3.5).
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def _env_override() -> Tuple[int, int] | None:
    index = os.environ.get("DEEPBINNER_TPU_PROCESS_INDEX")
    count = os.environ.get("DEEPBINNER_TPU_PROCESS_COUNT")
    if index is not None and count is not None:
        return int(index), int(count)
    return None


def process_index() -> int:
    override = _env_override()
    if override is not None:
        return override[0]
    import jax

    return jax.process_index()


def process_count() -> int:
    override = _env_override()
    if override is not None:
        return override[1]
    import jax

    return jax.process_count()


def is_primary_host() -> bool:
    return process_index() == 0


def should_emit_table() -> bool:
    """Whether this process prints its merged call table.

    With a real communicator the merge is global, so only host 0 prints.
    Under env-simulated sharding (tests) there is no communicator — each
    simulated process holds only its own shard and must print it; the test
    harness unions the outputs.
    """
    return _env_override() is not None or process_index() == 0


def shard_files(files: Sequence[str]) -> List[str]:
    """Deterministic per-process shard: sorted list, stride by process index.

    Sorting (not discovery order) is what makes re-runs and restarts safe:
    the shard is a pure function of the input set (SURVEY.md §5 failure row).
    """
    count = process_count()
    if count <= 1:
        return list(files)
    ordered = sorted(files)
    return ordered[process_index()::count]


def _encode_rows(rows: Sequence[Tuple[str, str]], width: int) -> np.ndarray:
    payload = json.dumps(rows).encode()
    if len(payload) > width:
        raise ValueError(f"shard table {len(payload)}B exceeds buffer {width}B")
    out = np.zeros((width + 8,), np.uint8)
    out[:8] = np.frombuffer(np.uint64(len(payload)).tobytes(), np.uint8)
    out[8 : 8 + len(payload)] = np.frombuffer(payload, np.uint8)
    return out


def _decode_rows(buffer: np.ndarray) -> list:
    length = int(np.frombuffer(buffer[:8].tobytes(), np.uint64)[0])
    payload = buffer[8 : 8 + length].tobytes().decode()
    return json.loads(payload)


def _allgather_json(payload_rows: list) -> List[list]:
    """All-gather one JSON-serialisable list per process → list of lists.

    The payload is padded to the global max shard size (gathered first) so
    the collective runs on one fixed-shape uint8 tensor.
    """
    from jax.experimental import multihost_utils

    local_size = len(json.dumps(payload_rows).encode())
    sizes = multihost_utils.process_allgather(np.asarray([local_size], np.int64))
    width = int(np.max(sizes))
    encoded = _encode_rows(payload_rows, width)
    gathered = multihost_utils.process_allgather(encoded)
    return [_decode_rows(gathered[i]) for i in range(gathered.shape[0])]


def merge_call_tables(
    local_rows: Sequence[Tuple[str, str]]
) -> List[Tuple[str, str]]:
    """All-gather per-shard call tables and merge canonically (sorted ids)."""
    from deepbinner_tpu.utils.table import merge_shard_tables

    count = process_count()
    if count <= 1 or _env_override() is not None:
        # Single process (or env-simulated sharding, where there is no real
        # communicator): merge locally.
        return merge_shard_tables([list(local_rows)])
    shards = _allgather_json([list(r) for r in local_rows])
    return merge_shard_tables(
        [[tuple(item) for item in shard] for shard in shards]
    )


def merge_lines(local_lines: Sequence[str]) -> List[str]:
    """All-gather per-shard text lines and return the sorted union.

    Used for the --verbose table so multi-host verbose output is
    byte-identical to single-host, like the plain call table.
    """
    count = process_count()
    if count <= 1 or _env_override() is not None:
        # set() to match the multi-host path exactly: duplicate rows (e.g. a
        # copied fast5) must collapse identically at every host count.
        return sorted(set(local_lines))
    shards = _allgather_json(list(local_lines))
    merged: List[str] = []
    for shard in shards:
        merged.extend(shard)
    return sorted(set(merged))
