"""Command-line entry points (the reference's five script stages as one
consistent CLI suite: generate_data, train_autoencoder, train_policy,
sample, run_predictions, evaluate, visualize_dataset, play).

Importing this package enables JAX's persistent compilation cache: on the
axon TPU tunnel a cold UNet train-step compile is ~10 min, so every CLI
reuses compiled executables across invocations.
"""

import os


def enable_compile_cache(path: str = "/tmp/jax_cli_cache") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")


enable_compile_cache()
