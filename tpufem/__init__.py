"""tpufem — a TPU-native FEM sparse linear-algebra framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of the reference
``sml2004/CUDA-powered-mesh-handling-and-Iterative-solvers`` (see SURVEY.md):
batched element stiffness/mass/stress kernels for 1st/2nd-order tets, hexes,
wedges and Kirchhoff shells; matrix-free and assembled (BSR/CSR) operators
with deterministic scatter; constrained Krylov solvers; mesh topology
extraction; mesh partitioning with multi-chip shard_map execution; and a
hybrid direct+iterative subdomain solver.
"""

from . import native as _native  # noqa: F401  (tunes malloc for host passes)
from .core import materials, voigt
from .core.dtypes import Precision, default_precision, enable_x64
from .core.materials import elasticity_matrix, kirchhoff_D_matrix, lame_parameters
from .core.voigt import stress_tensor, stress_vector, von_mises
from .elements import tables
from .elements.tables import element_table, quadrature, shape_values
from .elements import solid
from .ops.scatter import ScatterPlan, element_dofs
from .ops.operator import (MatrixFreeOperator, block_operator,
                           diagonal_preconditioner, nodal_forces)
from .topology import convert as topo_convert
from .topology import diagnostics as topo_diagnostics
from .topology import edges as topo_edges
from .topology import faces as topo_faces
from .solvers.constraints import Constraints
from .elements import shell
from .elements.shell import (ShellOperator, local_frames, shell_nodal_forces,
                             shell_postprocess_values, shell_stiffness,
                             shell_stress)
from .solvers import cg as cg_module
from .solvers.cg import cg, masked_cg
from .solvers.bicgstab import bicgstab
from .solvers.gmres import gmres
from .solvers.newton import newton_raphson
from .solvers import modal
from .solvers.modal import lumped_mass_diagonal, modal_solver, naive_modal_solver
from .solvers.static import StaticModel, build_static_model, static_structure_solver
from .ops import assembly
from .ops.clustered import ClusteredOperator, ClusterPlan
from .ops.partial import PartialAssemblyOperator
from .parallel.halo import HaloFEM, HaloPartition, build_halo_fem
from .ops.assembly import BSRMatrix, assemble_bsr, bsr_matvec, build_bsr_structure
from .solvers.hybrid import HybridSystem, build_hybrid, hybrid_solve
from .parallel import dist, partition
from .parallel.dist import DistFEM, DistPartition, build_distributed_fem
from .io import vtk as vtk_io
from .io import h5 as h5_io
from .utils import meshgen
from .utils.format import human_readable_number

__version__ = "0.1.0"
