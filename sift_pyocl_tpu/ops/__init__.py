"""Compute ops (XLA formulations + Pallas TPU kernels)."""


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. the experimental
    axon remote-TPU platform, which reports platform "tpu" but is listed
    here defensively) — gates the auto-selection of Mosaic kernel paths."""
    import jax

    return jax.default_backend() in ("tpu", "axon")
