"""RichSem-TPU: a TPU-native (JAX/XLA/Pallas/pjit) detection framework.

A ground-up rebuild of the capabilities of MengLcool/RichSem (NeurIPS 2023,
arXiv 2310.12152): a DINO-style deformable-DETR detector for long-tailed LVIS
detection with a frozen CLIP teacher providing open-vocabulary classification
and training-time semantic distillation.

Reference parity map lives in SURVEY.md at the repo root; individual modules
cite the reference files (``/root/reference/<file>:<line>``) whose behavior
they re-implement TPU-first.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a repo-local directory.

    The flagship train step costs minutes of XLA+Mosaic compile per process;
    the cache makes every re-launch (bench, tools, driver checks, training
    restarts) hit precompiled executables instead. Opt out with
    ``RICHSEM_NO_COMPILE_CACHE=1``; override the location with
    ``JAX_COMPILATION_CACHE_DIR`` (which jax itself also honors).
    """
    import os

    if os.environ.get("RICHSEM_NO_COMPILE_CACHE") == "1":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # jax reads the env var itself
    try:
        import jax

        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            probe = os.path.join(cache_dir, ".write_probe")
            with open(probe, "w"):
                pass
            os.remove(probe)
        except OSError:
            # site-packages installs land beside an unwritable prefix —
            # fall back to a per-user cache instead of silently disabling
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "richsem_tpu", "jax"
            )
            os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
