from tokenreduction_tpu.reduction.topk import TopKVisionTransformer  # noqa: F401
from tokenreduction_tpu.reduction.evit import EViTVisionTransformer  # noqa: F401
from tokenreduction_tpu.reduction.tome import ToMeVisionTransformer  # noqa: F401
from tokenreduction_tpu.reduction.cluster import (  # noqa: F401
    DPCKNNVisionTransformer,
    KMedoidsVisionTransformer,
    PatchMergerVisionTransformer,
    SinkhornVisionTransformer,
    SiTVisionTransformer,
)
from tokenreduction_tpu.reduction.dyvit import DynamicVisionTransformer  # noqa: F401
from tokenreduction_tpu.reduction.ats import ATSVisionTransformer  # noqa: F401
from tokenreduction_tpu.reduction.heuristic import HeuristicVisionTransformer  # noqa: F401
