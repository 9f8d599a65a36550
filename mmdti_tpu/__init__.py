"""MM-DTI TPU: a TPU-native multimodal molecular property prediction framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the MM-DTI
reference (ndlongvn/MM-DTI): ChemBERTa SMILES transformer + Uni-Mol-style 3D
conformer encoder with pairwise Gaussian distance-bias attention, InfoNCE
cross-modal alignment, ConR/SupCon contrastive losses, FDS feature smoothing,
and the MolTrain / MolPredict / MolServe user APIs.

Compute path: jax / flax / pallas / pjit (bf16 matmuls on the MXU, fused
distance-bias attention kernels, data-parallel sharding over a device mesh).
Host path: a self-contained chemistry stack (SMILES parser, scaffolds,
conformer generation) with an optional RDKit adapter, plus an async
double-buffered input pipeline.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: keep `import mmdti_tpu.chem` usable without pulling in jax.
    if name in ("MolTrain", "MolPredict", "MolServe"):
        from mmdti_tpu import api

        return getattr(api, name)
    raise AttributeError(name)
