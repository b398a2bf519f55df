"""Multi-host bring-up: ``jax.distributed`` init + DCN-aware pod meshes.

The reference is single-process/single-GPU (SURVEY.md §2.5: no NCCL/MPI
anywhere; ``accelerate`` CPU-offload is its only multi-device machinery,
reference ``scripts/old_scripts/main_devstral-gptq.py:57-113``). The TPU
north star instead demands ≥85% scaling from 1 to 2 hosts, which on a v5e
pod slice means: one JAX process per host, brought up with
:func:`initialize`, and a mesh whose fast (tp/ep) axes ride ICI while the
slow (dp) axis rides DCN — :func:`make_pod_mesh` encodes that layout so
XLA's collectives never cross DCN for per-token tensor parallelism.

Two-host launch (run on every host, same command)::

    QTPU_COORDINATOR=host0:8476 QTPU_NUM_PROCESSES=2 QTPU_PROCESS_ID=$i \
        python -m quantizers_tpu.cli.serve --model <dir> --mesh dp=2,tp=4

The CPU dry-run analog (driver-checkable without TPU hardware) lives in
``tests/test_distributed.py``: two real OS processes, 4 virtual CPU
devices each, hybrid dp(DCN)×tp(ICI) mesh, one sharded quantized forward.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Bring up ``jax.distributed`` for a multi-process run.

    Arguments default to the ``QTPU_COORDINATOR`` / ``QTPU_NUM_PROCESSES``
    / ``QTPU_PROCESS_ID`` environment variables (matching the launch
    recipe above); on TPU pods with no explicit configuration JAX's own
    cluster autodetection is used. Returns ``True`` if a multi-process
    runtime was (or already had been) initialized, ``False`` for
    single-process runs — callers never need to branch on environment.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator_address = coordinator_address or os.environ.get("QTPU_COORDINATOR")
    if num_processes is None and os.environ.get("QTPU_NUM_PROCESSES"):
        num_processes = int(os.environ["QTPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("QTPU_PROCESS_ID"):
        process_id = int(os.environ["QTPU_PROCESS_ID"])

    if num_processes in (None, 0, 1) and coordinator_address is None:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    logger.info(
        "jax.distributed up: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count())
    return True


def make_pod_mesh(
    axis_sizes: Dict[str, int],
    dcn_axes: Tuple[str, ...] = ("dp",),
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a hybrid ICI×DCN mesh for a multi-host run.

    ``axis_sizes`` gives the *global* size of every named axis (e.g.
    ``{"dp": 2, "tp": 4}``). Axes named in ``dcn_axes`` span hosts (data /
    expert parallelism — infrequent, large transfers that tolerate DCN
    latency); all other axes are laid out within a host's ICI domain so
    tensor-parallel collectives in the per-token decode path stay on ICI.

    Single-process runs (including the 8-virtual-CPU-device test mesh)
    fall back to a plain contiguous mesh with the same axis names, so code
    written against :func:`make_pod_mesh` runs unchanged everywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(list(axis_sizes.values())))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")

    # granule = the ICI-connected island. TPU pods report a slice index;
    # everywhere else (multi-process CPU, one process per host) the
    # process is the island.
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    by_slice = None not in slice_ids and len(slice_ids) > 1
    n_granules = (len(slice_ids) if by_slice
                  else len({getattr(d, "process_index", 0) for d in devices}))
    dcn_total = int(np.prod([axis_sizes[a] for a in dcn_axes if a in axis_sizes]))
    if n_granules <= 1 or dcn_total <= 1 or dcn_total % n_granules:
        from .mesh import make_mesh

        return make_mesh(axis_sizes, devices=devices[:n])

    from jax.experimental import mesh_utils

    ici_shape = tuple(1 if a in dcn_axes else s for a, s in axis_sizes.items())
    dcn_shape = tuple(s if a in dcn_axes else 1 for a, s in axis_sizes.items())
    arr = mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices=devices[:n],
        process_is_granule=not by_slice)
    return Mesh(arr, tuple(axis_sizes.keys()))


def parse_mesh_arg(arg: str) -> Dict[str, int]:
    """``"dp=2,tp=4"`` -> ``{"dp": 2, "tp": 4}`` (CLI ``--mesh`` flag)."""
    out: Dict[str, int] = {}
    for part in arg.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition("=")
        if not size:
            raise ValueError(f"--mesh entries are name=size, got {part!r}")
        out[name.strip()] = int(size)
    return out
