"""TPU-native iterated-learning VLM framework.

A from-scratch JAX/Flax/Optax/Pallas re-design of the capabilities of
hellomuffin/iterated-learning-for-vlm (CVPR 2024 "Iterated Learning Improves
Compositionality in Large Vision-Language Models"):

- CLIP dual-encoder pretraining (ViT + text transformer) with a global-batch
  InfoNCE loss sharded over a ``jax.sharding.Mesh`` (reference:
  ``prototype/model/clip.py``).
- CLIP-FDT: a factorized-discrete-token codebook variant where patch/word
  tokens cross-attend into a shared codebook via sparsemax attention
  (reference: ``prototype/model/clip_fdt.py``).
- The iterated-learning training algorithm: periodic text-encoder
  re-initialisation with codebook holding and vision freezing (reference:
  ``example/clip_fdt/train_solver.py:545-557``).
- An evaluation harness covering compositionality (SugarCREPE, CREPE, COLA,
  Winoground), zero-shot classification/retrieval and linear probing
  (reference: ``CLIP_benchmark/``).

Everything on the compute path is jit-compiled XLA with optional Pallas
kernels; parallelism is SPMD over a device mesh (no hand-written
communication layer).
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX at a persistent compilation cache so repeat invocations of
    the same entry point (bench, train, eval CLI, dryrun) skip the 1-10 min
    cold XLA compile of the full train step.  Call before first device use.
    Safe no-op on backends/configs that reject the option."""
    import os

    import jax

    path = path or os.environ.get(
        "ILVLM_COMPILATION_CACHE", os.path.expanduser("~/.cache/ilvlm_xla_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
