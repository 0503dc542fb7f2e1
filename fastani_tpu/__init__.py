"""fastani_tpu — a TPU-native whole-genome ANI engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ParBLiSS/FastANI:
alignment-free Average Nucleotide Identity between genome assemblies via
winnowed-minimizer MinHash sketching and Mashmap-style two-stage mapping.

Public API:
    fastani_tpu.config.Parameters     — run configuration (mirrors the reference CLI)
    fastani_tpu.models.pipeline       — end-to-end ANI engine
    fastani_tpu.cli                   — `python -m fastani_tpu` command line
"""

__version__ = "0.1.0"
