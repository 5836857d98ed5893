"""cufhe_tpu — TPU-native TFHE gate bootstrapping (capabilities of
virtualsecureplatform/cuFHE, re-designed for JAX/XLA/Pallas).

Layers (mirrors SURVEY.md §1, TPU-first):
  params   — runtime parameter sets (reference: TFHEpp params via CMake flags)
  golden   — NumPy bit-exact oracle (replaces the TFHEpp submodule)
  ops      — JAX/XLA/Pallas compute path (blind rotate, keyswitch, polymul)
  models   — gate set + composite encrypted circuits
  parallel — mesh sharding / multi-chip scale-out (replaces multi-GPU streams)
  utils    — serialization, timing
"""
from . import golden, params
from .params import (CGGI19, CONCRETE, DEFAULT, PRESETS, TFHEPP_128,
                     TFHEPP_128_BG8, TFHEPP_80, TINY, TINY_K2, GateParams)

__version__ = "0.1.0"
