"""dc_vic_tpu — TPU-native rebuild of DC-VIC (dual-conditioned VQGAN-based image compression).

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch/CUDA codebase (iwa-shi/DC_VIC): GAN-based learned image compression with a
frozen VQGAN prior, dual (rate, vq-faithfulness) conditioning, channel-autoregressive
entropy modelling, and a real rANS bitstream.

Layers (see SURVEY.md):
  utils/    config (_base_ yaml merge), registry, logging, paths           (ref: src/utils/)
  nn/       flax modules: ELIC blocks, NLAM, FiLM, Fourier, Swin, SFT, GDN (ref: src/models/layer/)
  models/   VQGAN prior, composite compression models, discriminators      (ref: src/models/, ldm/, taming/)
  ops/      Pallas kernels (VQ argmin), C++ rANS codec, CDF tables         (ref: compressai C++ deps)
  codec/    entropy models, header/container, compress/decompress drivers  (ref: src/models/comp_model/)
  train/    optax trainers, losses, schedulers, checkpointing              (ref: src/trainer/, src/losses/)
  data/     host image pipeline                                            (ref: src/dataset/)
  metrics/  PSNR / MS-SSIM / FID(HiFiC) / LPIPS                            (ref: scripts/calc_metrics.py)
  parallel/ device mesh + sharding helpers (data-parallel over ICI)
"""

__version__ = "0.1.0"

# The axon TPU PJRT plugin force-prepends itself to jax_platforms at import
# time, silently overriding the standard JAX_PLATFORMS env var. Restore the
# documented behavior: if the user set JAX_PLATFORMS, honor it.
import os as _os

if (_os.environ.get("JAX_PLATFORMS")
        and "axon" not in _os.environ["JAX_PLATFORMS"]):
    import jax as _jax

    try:
        if _jax.config.jax_platforms != _os.environ["JAX_PLATFORMS"]:
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
        if _os.environ.get("JAX_NUM_CPU_DEVICES"):
            _jax.config.update("jax_num_cpu_devices",
                               int(_os.environ["JAX_NUM_CPU_DEVICES"]))
    except Exception:  # already initialized — leave as-is
        pass
