"""Video-LLaVA-Seg TPU — a TPU-native JAX framework with the capabilities of
Ali2500/Video-LLaVA-Seg (video LLM captioning + [SEG]-grounded video segmentation
via a SAM2-style head, plus standalone SAM2 image/video predictors).

Not a port: the compute path is jax/XLA/pallas/pjit designed for TPU
(MXU-shaped matmuls, static shapes, scan-friendly memory banks, mesh sharding
over ICI), with functional modules carrying explicit parameter pytrees.
"""

__version__ = "0.1.0"
