"""Multi-chip scale-out: device meshes, row-sharded lattices, sharded CG."""

from .halo_cg import build_halo_plan, halo_solve, solve_auto  # noqa: F401
from .hierarchical import hierarchical_settle  # noqa: F401
from .mesh import lattice_mesh  # noqa: F401
from .reorder import apply_order, halo_stats, pca_bisection_order  # noqa: F401
from .sharded import sharded_build_and_settle, sharded_settle_fn  # noqa: F401
from .streaming import StreamingLattice  # noqa: F401
