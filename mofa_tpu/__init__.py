"""MOFA-TPU: a TPU-native (JAX/XLA/Pallas) image-to-video motion-field animation framework.

Re-implements the full capability surface of MOFA-Video (controllable image
animation by steering a frozen Stable-Video-Diffusion UNet with a trainable
flow-warping ControlNet branch) as an idiomatic JAX framework:

- ``mofa_tpu.kernels``   Pallas TPU kernels (softmax splatting fwd+VJP, attention)
- ``mofa_tpu.ops``       pure-jnp numerics (schedulers, resizes, flow, rasterizers)
- ``mofa_tpu.models``    Flax modules (SVD UNet, MOFA adapters, CMP, VAE, CLIP)
- ``mofa_tpu.pipelines`` jit/scan denoising pipelines (single, dual, windowed)
- ``mofa_tpu.parallel``  mesh/sharding layer (frame-parallel inference, DP training)
- ``mofa_tpu.train``     EDM training losses + stage1/stage2 steps
"""

__version__ = "0.1.0"
