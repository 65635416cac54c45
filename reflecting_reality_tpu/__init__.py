"""reflecting_reality_tpu — a TPU-native JAX/Flax/Pallas rebuild of MirrorFusion.

Reimplements the capabilities of val-iisc/Reflecting-Reality ("MirrorFusion",
3DV 2025) — depth-conditioned mirror-reflection inpainting built on a
BrushNet-style dual-branch Stable Diffusion 1.5 — as an idiomatic TPU stack:

- flax.linen modules in NHWC layout (MXU/convolution friendly)
- jit/scan-compiled end-to-end samplers (no per-step Python dispatch)
- functional, pytree-carried schedulers (DDPM / DDIM / UniPC)
- pjit/shard_map data parallelism over a `jax.sharding.Mesh`
- Pallas kernels for flash attention and fused GroupNorm+SiLU

The public surface mirrors the reference's entry points (train / inference /
eval CLIs, checkpoint folder layout, config.json round-trips) so users of the
reference can switch over without re-learning the API.
"""

__version__ = "0.1.0"

from reflecting_reality_tpu.core.config import ConfigMixin  # noqa: F401
