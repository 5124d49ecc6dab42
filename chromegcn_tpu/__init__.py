"""ChromeGCN-TPU: a TPU-native framework for chromosome-scale epigenomic
state prediction (sequence CNN -> whole-chromosome gated GCN over Hi-C graphs).

Built from scratch for JAX/XLA/Pallas on TPU with the capabilities of the
QData/ChromeGCN reference (Lanchantin & Qi, Bioinformatics 2020).

Subpackages
-----------
- ``ops``      — sparse graph containers, SpMM/SDDMM (Pallas + XLA), sequence ops
- ``models``   — window CNNs (Expecto/DeepSEA/DanQ), chromosome models (GCN/RNN)
- ``train``    — optimizers, train steps, epoch runner, metrics, checkpointing
- ``parallel`` — device meshes, data-parallel pretrain, edge-partitioned GCN
- ``pipeline`` — offline data ingest (windows/peaks/seqs/labels/Hi-C graphs)
- ``data``     — runtime batch loading and synthetic data generators
"""

__version__ = "0.1.0"

from chromegcn_tpu.ops.sparse import SparseGraph  # noqa: F401
