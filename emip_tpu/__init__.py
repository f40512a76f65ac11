"""EMIP-TPU: a TPU-native JAX framework for video camouflaged object detection.

Re-designed from scratch after the EMIP reference (zhangxin06/EMIP, IEEE TIP 2025):
an object-segmentation stream (PVTv2 encoder + neighbor-connection decoder) and an
explicit-motion stream (GMFlow optical flow), exchanging information through two
cross-attention prompt modules (camouflage feeder / motion collector), plus a
long-term space-time-memory variant.

Everything here is JAX/XLA/Pallas-first: NHWC layouts, static shapes, functional
modules (flax.linen), `lax.scan` over repeated blocks, a `jax.sharding.Mesh` for
data parallelism, and Pallas kernels for the hot fused ops.
"""

__version__ = "0.1.0"
