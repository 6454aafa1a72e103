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
from .ops.tensor_product import L1TensorProduct, TensorProduct

__version__ = "0.1.0"
