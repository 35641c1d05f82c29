"""newmsm_tpu — a TPU-native Multimodal Surface Matching framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the newMSM
reference (rbesenczi/newMSM): discrete-optimisation registration of spherical
cortical surface meshes, pairwise and groupwise, with anatomical (aMSM)
regularisation.

Layering (mirrors reference layer map, SURVEY.md §1, but TPU-first):

  core/      icosphere topology, spherical math, mesh containers, file I/O
  ops/       device kernels: nearest-triangle search, resampling, smoothing,
             strain, unfolding, histogram matching, similarity reductions
  reg/       featurespace, discrete MRF model, cost volumes, optimisers,
             rigid alignment, multiresolution drivers (pairwise + groupwise)
  cli.py     `newmsm`-compatible command line

Everything on the hot path is fixed-shape, pure-functional and jitted; mesh
topology (icosphere adjacency, candidate lists) is precomputed host-side once
per resolution and cached.
"""

RAD = 100.0          # sphere radius used throughout (reference point.h:32)
EPSILON = 1e-8       # geometric tolerance (reference point.h:31)
FOLDING = 1e7        # folding penalty (reference reg_tools.h:30)
FIX_NAN = 1e7        # NaN replacement cost (reference reg_tools.h:31)

__version__ = "0.1.0"
