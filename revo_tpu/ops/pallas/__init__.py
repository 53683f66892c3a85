"""Pallas TPU kernels for the hot ops.

Kernels here replace XLA-composed implementations where on-chip iteration or
fusion beats the compiler: hysteresis (the Canny fixpoint loop runs entirely
in VMEM instead of one kernel launch + HBM round trip per dilation).
Each kernel has an interpret-mode path so the CPU test suite exercises the
same code (pl.pallas_call(interpret=True) off-TPU).
"""

from revo_tpu.ops.pallas.vma import out_struct
from revo_tpu.ops.pallas.hysteresis import hysteresis_pallas

__all__ = ["hysteresis_pallas", "out_struct"]
