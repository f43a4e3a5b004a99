"""tokenreduction_tpu: a TPU-native (JAX/Flax/Pallas) token-reduction framework.

A ground-up rebuild of the capabilities of JoakimHaurum/TokenReduction
(ICCVW 2023, arXiv 2308.04657): ten token-reduction methods on a shared
DeiT backbone, a finetuning/eval engine, four dataset pipelines, and the
offline reduction-pattern analysis suite -- re-designed for TPU:

- static shapes everywhere (per-stage token counts are config-time constants)
- explicit PRNG key threading (no hidden nondeterminism in eval forwards)
- jit-able train/eval steps with gradient-accumulation `lax.scan`
- data-parallel `jax.sharding.Mesh` + `psum` metric sync instead of NCCL DDP
- Pallas fused attention+score kernels on the hot path
"""

__version__ = "0.1.0"

from tokenreduction_tpu.models.registry import create_model, list_models  # noqa: F401
