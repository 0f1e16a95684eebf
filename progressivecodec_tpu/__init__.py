"""progressivecodec_tpu — a TPU-native progressive learned image codec.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
EIDOSLAB/ProgressiveCodec (variance-aware channel-progressive codec): one
trained model + one embedded bitstream serves a continuum of rate points.

Design stance (not a port):
  * functional core — pure jit-able forward / encode / decode / train step
  * NHWC layout, bf16-friendly transforms, f32 entropy math
  * on-device vectorized rANS entropy coder (interleaved lanes)
  * multi-chip via jax.sharding.Mesh + shard_map (data parallel + spatial
    tiling with halo exchange), global mask statistics via collectives
"""

__version__ = "0.1.0"

from progressivecodec_tpu import config as config
from progressivecodec_tpu import ops as ops
