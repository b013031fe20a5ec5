"""Process-level runtime setup shared by all CLIs."""
from __future__ import annotations

import os


def setup(cache_dir: str | None = None):
    """Enable the persistent XLA compilation cache (kernel compiles for the
    rasterizer take minutes on remote TPU backends; cache them across
    processes) and keep default matmul precision at f32 for camera math.

    `GAUSSMART_PLATFORM=cpu` (or any platform name) force-selects the JAX
    platform via jax.config — needed because some TPU plugins (axon) ignore
    the standard JAX_PLATFORMS env var, and a stray CLI grabbing the one
    real TPU chip mid-training can crash the worker."""
    import jax

    plat = os.environ.get("GAUSSMART_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # TPU matmuls default to bfloat16 operands; the splat->pixel projection
    # (raster_common.preprocess) at bf16 puts projected centers off by up to
    # 1.31 px at 776x584 (measured on v5e; 6e-8 at f32), which corrupts
    # geometry, densify stats and CUDA parity. The hot-path matmuls are
    # tiny-contraction camera math, so full f32 costs nothing measurable;
    # models that want bf16 MXU throughput (the DINO ViT) can request it
    # per-op via precision=.
    jax.config.update("jax_default_matmul_precision", "float32")

    cache_dir = cache_dir or os.environ.get(
        "GAUSSMART_COMPILE_CACHE",
        os.path.expanduser("~/.cache/gaussmart_tpu/xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[runtime] compilation cache unavailable: {e}")
