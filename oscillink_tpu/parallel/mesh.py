"""Device-mesh construction for row-sharded lattices.

The parallelism model (SURVEY.md §2.7, §5.7): anchor rows Y / solver state U
are block-sharded over a 1-D ``rows`` mesh axis (the lattice analog of
sequence/context parallelism).  CG's cross-shard reductions (r·z, p·Ap) ride
ICI all-reduces; the Laplacian gather pulls neighbor halos.  Multi-host DCN
meshes extend the same axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

__all__ = ["lattice_mesh"]


def lattice_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = "rows",
) -> Mesh:
    """Build a 1-D mesh over ``n_devices`` (default: all local devices)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
