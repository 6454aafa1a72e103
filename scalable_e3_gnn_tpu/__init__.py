"""scalable_e3_gnn_tpu — a TPU-native framework for SEGNN-style E(3)-equivariant
message passing on large point clouds (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of gnlpfjh/Scalable-E3-GNN (reference
analyzed in SURVEY.md): steerable-feature Clebsch-Gordan tensor products with an
lmax=1 fast path matching the reference's ``L1TensorProduct`` activation-for-
activation, segment-sum gather/scatter aggregation, radius-graph and vectorized
level-by-level octree construction, and multi-host scaling via edge-partitioned
graphs with halo exchange over ICI.
"""

from .core.irreps import Instruction, Irrep, Irreps, MulIrrep
from .core.spherical import spherical_harmonics
from .core.wigner import wigner_3j
from .graph.container import DenseEdgeGraph, SteerableGraph
from .graph.octree import Octree, build_octree
from .graph.radius import radius_graph_brute, radius_graph_cell
from .models.segnn import SEGNN, O3TensorProductGate, SEGNNLayer
from .ops.gate import Gate
from .ops.gather_scatter import scatter_sum, sddmm, segment_mean, segment_sum, spmm
from .ops.linear import O3LayerNorm, O3Linear
from .ops.tensor_product import L1TensorProduct, TensorProduct

__version__ = "0.1.0"
