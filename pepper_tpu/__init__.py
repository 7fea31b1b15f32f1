"""pepper_tpu — a TPU-native long-read variant caller / assembly polisher.

A from-scratch JAX/XLA/Pallas implementation of the PEPPER method (the
RNN-based module of the PEPPER-Margin-DeepVariant pipeline): aligned reads
from a BAM are summarized into per-candidate pileup tensors, classified with
a bidirectional recurrent window model running as `jax.lax.scan` on TPU, and
decoded into genotyped VCF records (variant-calling mode) or a polished
consensus FASTA (assembly-polishing mode).

Package layout:
  io/        host-side C++ (zlib-backed) BAM/FASTA/VCF readers and writers
  ops/       pileup summary encoders (numpy golden + JAX/Pallas kernels)
  models/    window classifier / consensus transducer models (JAX)
  infer/     batched jit inference runners
  decode/    candidate genotyping, VCF emission, consensus stitching
  train/     optax training loops (data-parallel over jax.sharding.Mesh)
  parallel/  mesh + sharding helpers, multi-host region manifest
  polish/    assembly-polishing pipeline
  cli/       command-line interface mirroring the reference's subcommands

Behavioral reference: PEPPER r0.8 (see SURVEY.md for the structural map).
"""

__version__ = "0.1.0"
