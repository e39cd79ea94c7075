"""galah_tpu — a TPU-native genome dereplication engine.

A from-scratch reimplementation of the capabilities of galah
(https://github.com/wwood/galah) designed for TPU hardware: k-mer
sketching, all-vs-all sketch comparison and high-precision ANI run as
JAX/XLA/Pallas kernels; the greedy quality-ordered clustering runs on
host over the sparse above-threshold pair list.

Public API mirrors the reference's five plugin interfaces
(reference: src/lib.rs:29-76) as Python ABCs in galah_tpu.engines.
"""

__version__ = "0.1.0"

from galah_tpu import defaults  # noqa: F401

__all__ = ["defaults", "__version__"]
