"""Parallelism layer: device meshes + GSPMD sharding rules.

The reference is single-process/single-GPU (SURVEY.md §2.5: no NCCL/MPI
anywhere; CPU offload via accelerate is its only "multi-device" feature).
The TPU-native stack instead scales through ``jax.sharding``: a named
:class:`~jax.sharding.Mesh` (``dp`` over hosts/DCN, ``tp`` over ICI,
``ep`` for experts) plus PartitionSpec rules for every weight layout, with
XLA inserting the all-gather/psum collectives.
"""

from .distributed import (  # noqa: F401
    initialize,
    make_pod_mesh,
    parse_mesh_arg,
)
from .ring import ring_attention  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    shard_params,
    param_pspecs,
    activation_pspec,
    kv_cache_pspecs,
)
