from tokenreduction_tpu.ops.gather import take_tokens, complement_idx  # noqa: F401
from tokenreduction_tpu.ops.tome import (  # noqa: F401
    bipartite_soft_matching,
    merge_tokens_tome,
    merge_source_assignment,
    merge_wavg,
)
from tokenreduction_tpu.ops.sinkhorn import log_optimal_transport  # noqa: F401
from tokenreduction_tpu.ops.dpc_knn import cluster_dpc_knn, merge_clusters  # noqa: F401
from tokenreduction_tpu.ops.kmedoids import k_medoids_fit  # noqa: F401
from tokenreduction_tpu.ops.ats import adaptive_token_sampling  # noqa: F401
