"""Multi-host data placement: build global device arrays from per-process
shards.

Single-process JAX can ``device_put`` a full host array onto any sharding;
on a pod each process owns only a subset of devices and must construct
global arrays from process-LOCAL data
(``jax.make_array_from_process_local_data``). The reference never faces
this (its one parallelism is single-process nn.DataParallel — reference:
main.py:92-94); the BASELINE north star (>=75% scaling to 2+ hosts)
requires it.

Contracts:
- every sharded axis is CONTIGUOUS per process (mesh axes are built from
  ``jax.devices()`` order, which enumerates process-major — parallel.mesh),
  so a process's shard of a row-sharded array is one contiguous row range,
  computable deterministically at ingest time via ``local_row_range``;
- data loading stays deterministic: every host derives its slice from the
  same (sharding, global shape) pair — no coordination traffic.

``put_global`` is the single entry point the trainers use: it degrades to
a plain ``device_put`` in a single process, so the trainer code paths are
identical on one host and on a pod.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding


def local_row_range(
    sharding: NamedSharding, global_shape: Tuple[int, ...]
) -> Tuple[int, int]:
    """Contiguous [start, stop) of leading-axis rows owned by this process.

    Derived from the sharding's device->index map, so it is exactly what
    ``make_array_from_process_local_data`` expects this process to supply.
    Raises if the process's rows are not one contiguous range (would mean
    a non-contiguous mesh layout — not produced by parallel.mesh).
    """
    idx_map = sharding.devices_indices_map(tuple(global_shape))
    pid = jax.process_index()
    starts, stops = [], []
    for dev, idx in idx_map.items():
        if dev.process_index != pid:
            continue
        sl = idx[0]
        starts.append(0 if sl.start is None else int(sl.start))
        stops.append(global_shape[0] if sl.stop is None else int(sl.stop))
    if not starts:
        raise ValueError("this process owns no devices of the sharding")
    lo, hi = min(starts), max(stops)
    # verify contiguity: the union of per-device ranges must tile [lo, hi)
    covered = sorted(zip(starts, stops))
    pos = lo
    for s, e in covered:
        if s > pos:
            raise ValueError(
                f"process rows are not contiguous: gap at [{pos}, {s})"
            )
        pos = max(pos, e)
    assert pos == hi
    return lo, hi


def put_global(arr, sharding: NamedSharding, *, already_local: bool = False):
    """Place an array onto ``sharding``, multi-process aware.

    Single process: plain ``device_put`` of the full array. Multi-process:
    ``arr`` is either the full logical array (each host slices out its own
    rows — fine when every host loads the same artifact) or, with
    ``already_local=True``, this process's row shard as produced by
    ingest-time file sharding; either way the global array is assembled
    with ``jax.make_array_from_process_local_data`` — no host ever ships
    another host's rows.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    if already_local:
        # global extent comes from the sharding's process count; verify the
        # derived shape against the sharding's actual per-process row
        # assignment — an unequal/non-contiguous layout would otherwise
        # produce a consistent-but-wrong global shape silently (ADVICE r3)
        n_global = arr.shape[0] * jax.process_count()
        global_shape = (n_global,) + arr.shape[1:]
        lo, hi = local_row_range(sharding, global_shape)
        if hi - lo != arr.shape[0]:
            raise ValueError(
                f"already_local shard has {arr.shape[0]} rows but the "
                f"sharding assigns rows [{lo}, {hi}) ({hi - lo}) to this "
                f"process for derived global shape {global_shape}"
            )
        return jax.make_array_from_process_local_data(
            sharding, arr, global_shape
        )
    lo, hi = local_row_range(sharding, arr.shape)
    return jax.make_array_from_process_local_data(
        sharding, arr[lo:hi], arr.shape
    )


def host_batch_slice(batch_size: int, sharding: NamedSharding) -> Tuple[int, int]:
    """Deterministic per-host batch row assignment for DP pretraining:
    the contiguous [start, stop) of each global batch this host feeds."""
    return local_row_range(sharding, (batch_size,))
