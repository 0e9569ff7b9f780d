

def set_platform(platform: str) -> None:
    """Select the JAX platform ('cpu' to bypass the TPU, e.g. for small jobs —
    the env var alone is overridden by site hooks on some hosts)."""
    if platform and platform != "default":
        import jax

        jax.config.update("jax_platforms", platform)
