"""fqsqueezer_tpu — TPU-native FASTQ compression framework.

A from-scratch JAX/XLA/Pallas re-design of the k-mer-statistics compression
method of refresh-bio/fqsqueezer (see DESIGN.md and SURVEY.md).
"""
__version__ = "0.1.0"
