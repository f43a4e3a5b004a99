from tokenreduction_tpu.core.config import ViTConfig, reduction_schedule  # noqa: F401
from tokenreduction_tpu.core.layers import (  # noqa: F401
    Attention,
    Block,
    DropPath,
    Mlp,
    PatchEmbed,
    attention_core,
)
