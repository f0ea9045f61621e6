"""itrx — a TPU-native (JAX/XLA/Pallas/pjit) image-text retrieval framework.

A ground-up rebuild of the capabilities of the SIGIR'22 reproducibility
benchmark "Image-text Retrieval" (reference: /root/reference): six methods
(VSE++, SCAN, VSRN, SAEM, SGRAF, CAMERA) sharing one config system, one data
pipeline, one train loop and one Recall@K evaluation stack — redesigned for
TPU:

 - static shapes + mask arithmetic instead of sort/pack/pad (ref
   itr/datamodule/data_loader.py:146),
 - masked `lax.scan` GRUs instead of cuDNN packed GRU (ref
   itr/modalmodule/TextEncoder.py:38-70),
 - batched einsum / Pallas cross-attention similarity instead of per-caption
   Python loops (ref itr/modalmodule/Objectives.py:329-417),
 - device-resident sharded sim-matrix + rank reduction for evaluation instead
   of host-sharded numpy blocks (ref itr/metricmodule/evaluation.py:124-153),
 - data-parallel training and caption-sharded evaluation over a
   `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
