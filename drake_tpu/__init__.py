"""drake_tpu: a TPU-native MPC + trajectory-optimization framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the g1n0st/drake
reference (Drake + GPU-MPM fork): articulated multibody dynamics, SAP convex
contact, direct-collocation / contact-implicit trajectory optimization, the
LQR controller family, MPM deformables, and batched MPC harnesses — all as
pure jittable functions sharded over device meshes.
"""

__version__ = "0.1.0"
