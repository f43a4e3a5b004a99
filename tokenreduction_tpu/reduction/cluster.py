"""Cluster/merge family: SiT, PatchMerger, Sinkhorn, DPC-KNN, K-Medoids.

These leave the transformer blocks stock and insert a `cluster_layers[k]`
module *between* blocks, splitting off the prefix (CLS) tokens first
(reference models/sit.py:115-128 and siblings). The `cluster_layers` name is
load-bearing: the optimizer factory gives those params full LR via
`get_new_module_names()` (reference optim.py:45-46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import TRUNC02, ViTBase
from tokenreduction_tpu.ops.dpc_knn import cluster_dpc_knn, merge_clusters
from tokenreduction_tpu.ops.gather import take_tokens
from tokenreduction_tpu.ops.kmedoids import k_medoids_fit
from tokenreduction_tpu.ops.sinkhorn import log_optimal_transport

NORMAL1 = nn.initializers.normal(stddev=1.0)


# --------------------------------------------------------------------------
# cluster layer modules
# --------------------------------------------------------------------------
class TokenSlimmingModule(nn.Module):
    """SiT: token-wise MLP logits, softmax over tokens with a learned
    temperature (reference models/sit.py:25-40)."""

    embed_dim: int
    cluster_centers: int
    ratio: float = 0.5

    @nn.compact
    def __call__(self, x):
        h = int(self.embed_dim * self.ratio)
        w = nn.LayerNorm(epsilon=1e-5, name="weight_ln")(x)
        w = nn.Dense(h, kernel_init=TRUNC02, name="weight_fc1")(w)
        w = nn.gelu(w, approximate=False)
        w = nn.Dense(
            self.cluster_centers, kernel_init=TRUNC02, name="weight_fc2"
        )(w)
        scale = self.param("scale", nn.initializers.ones, (1, 1, 1))
        w = jax.nn.softmax(w * scale, axis=1)  # over tokens
        w = jnp.swapaxes(w, 2, 1)  # [B, K, N]
        out = jnp.einsum(
            "bkn,bnc->bkc", w, x, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return out, w, None


class PatchMerger(nn.Module):
    """Learned queries attending over LayerNormed tokens
    (reference models/patchmerger.py:24-39; unscaled attention)."""

    embed_dim: int
    cluster_centers: int
    scaled_attention: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.embed_dim ** -0.5 if self.scaled_attention else 1.0
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        queries = self.param(
            "queries", NORMAL1, (self.cluster_centers, self.embed_dim)
        )
        sim = jnp.einsum(
            "kd,bnd->bkn", queries, x, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum(
            "bkn,bnd->bkd", attn.astype(x.dtype), x,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return out, attn, queries


class SinkhornCluster(nn.Module):
    """Learned unit-sphere cluster vectors + log-space OT assignment
    (reference models/sinkhorn.py:59-86).

    The reference renormalizes `v` in place every forward (sinkhorn.py:73-76)
    -- functionally: the forward uses normalize(v) with an identity gradient
    (straight-through), and the train step projects `v` back to the unit
    sphere after each optimizer update (see train/optim.py:project_params).
    """

    embed_dim: int
    cluster_centers: int
    eps: float
    iters: int

    @nn.compact
    def __call__(self, x):
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        v = self.param("v", NORMAL1, (self.cluster_centers, self.embed_dim))
        v_normed = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        v_used = v + jax.lax.stop_gradient(v_normed - v)
        scores = jnp.einsum(
            "bnd,kd->bnk", x, v_used, preferred_element_type=jnp.float32
        )
        weights = log_optimal_transport(
            jnp.swapaxes(scores, 1, 2), self.eps, self.iters
        )  # [B, K, N]
        out = jnp.einsum(
            "bkn,bnd->bkd", weights.astype(x.dtype), x,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return out, weights, v_used


class CTM(nn.Module):
    """DPC-KNN clustering + learned-score weighted merge
    (reference models/dpcknn.py:143-172)."""

    embed_dim: int
    cluster_num: int
    k: int = 5
    equal_weight: bool = False

    @nn.compact
    def __call__(self, x, idx_token, agg_weight, noise=None):
        if not self.equal_weight:
            score = nn.Dense(1, kernel_init=TRUNC02, name="score")(x)
            token_weight = jnp.exp(score)
        else:
            token_weight = None
        idx_cluster, idx_centers = cluster_dpc_knn(
            x, self.cluster_num, self.k, noise=noise
        )
        centers = take_tokens(x, idx_centers)
        x, idx_token, agg_weight = merge_clusters(
            x, idx_cluster, self.cluster_num, token_weight,
            idx_token, agg_weight,
        )
        return x, idx_token, agg_weight, idx_centers, idx_cluster, centers


# --------------------------------------------------------------------------
# shared forward scaffold for the soft-assignment trio
# --------------------------------------------------------------------------
class _SoftClusterViT(ViTBase):
    """SiT / PatchMerger / Sinkhorn share the exact same loop; only the
    cluster layer and whether Center_Feats exist differ."""

    capture_centers: bool = False

    @staticmethod
    def new_module_names():
        return ["cluster_layers"]

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        viz = {"Assignment_Maps": {}, "Soft_Assignment_Maps": {},
               "Features": {}}
        if self.capture_centers:
            viz["Center_Feats"] = {}
        cnt = 0
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                prefix = x[:, : c.num_prefix_tokens]
                rest, soft, centers = self.cluster_layers[cnt](
                    x[:, c.num_prefix_tokens:]
                )
                if c.viz_mode:
                    viz["Soft_Assignment_Maps"][i] = soft
                    viz["Assignment_Maps"][i] = soft.argmax(axis=-2)
                    if self.capture_centers and centers is not None:
                        viz["Center_Feats"][i] = jnp.broadcast_to(
                            centers[None], (x.shape[0],) + centers.shape
                        )
                x = jnp.concatenate([prefix, rest], axis=1)
                cnt += 1
            x, _ = blk(x, deterministic=det)
            if c.viz_mode and i in c.reduction_loc:
                viz["Features"][i] = x
        if c.viz_mode and (c.depth - 1) not in viz["Features"]:
            viz["Features"][c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, viz
        return out


class SiTVisionTransformer(_SoftClusterViT):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        sched = reduction_schedule(self.cfg)
        self.cluster_layers = [
            TokenSlimmingModule(self.cfg.embed_dim, sched[k])
            for k in range(len(self.cfg.reduction_loc))
        ]


class PatchMergerVisionTransformer(_SoftClusterViT):
    capture_centers: bool = True

    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        sched = reduction_schedule(self.cfg)
        self.cluster_layers = [
            PatchMerger(self.cfg.embed_dim, sched[k])
            for k in range(len(self.cfg.reduction_loc))
        ]


class SinkhornVisionTransformer(_SoftClusterViT):
    capture_centers: bool = True

    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        sched = reduction_schedule(self.cfg)
        self.cluster_layers = [
            SinkhornCluster(
                self.cfg.embed_dim, sched[k],
                self.cfg.sinkhorn_eps, self.cfg.cluster_iters,
            )
            for k in range(len(self.cfg.reduction_loc))
        ]


# --------------------------------------------------------------------------
# DPC-KNN and K-Medoids (hard assignments, extra state threading)
# --------------------------------------------------------------------------
class DPCKNNVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        sched = reduction_schedule(self.cfg)
        self.cluster_layers = [
            CTM(self.cfg.embed_dim, sched[k], self.cfg.k_neighbors,
                self.cfg.equal_weight)
            for k in range(len(self.cfg.reduction_loc))
        ]

    @staticmethod
    def new_module_names():
        return ["cluster_layers"]

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        B = x.shape[0]
        idx_token = jnp.broadcast_to(
            jnp.arange(c.num_patches), (B, c.num_patches)
        )
        agg_weight = jnp.ones((B, c.num_patches, 1), dtype=x.dtype)
        viz = {"Kept_Tokens": {}, "Assignment_Maps": {},
               "Center_Feats": {}, "Features": {}}
        cnt = 0
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                prefix = x[:, : c.num_prefix_tokens]
                rest = x[:, c.num_prefix_tokens:]
                noise = None
                if self.has_rng("cluster"):
                    noise = jax.random.uniform(
                        self.make_rng("cluster"), rest.shape[:2], rest.dtype
                    )
                rest, idx_token, agg_weight, idx_centers, idx_cluster, \
                    centers = self.cluster_layers[cnt](
                        rest, idx_token, agg_weight, noise
                    )
                if c.viz_mode:
                    viz["Kept_Tokens"][i] = idx_centers
                    viz["Assignment_Maps"][i] = idx_cluster
                    viz["Center_Feats"][i] = centers
                x = jnp.concatenate([prefix, rest], axis=1)
                cnt += 1
            x, _ = blk(x, deterministic=det)
            if c.viz_mode and i in c.reduction_loc:
                viz["Features"][i] = x
        if c.viz_mode and (c.depth - 1) not in viz["Features"]:
            viz["Features"][c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, viz
        return out


class KMedoidsVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.schedule = reduction_schedule(self.cfg)

    @staticmethod
    def new_module_names():
        return ["cluster_layers"]  # parity: reference kmedoids.py:214-215

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        assert all(l > 0 for l in c.reduction_loc), (
            "k-medoids needs attention weights from the preceding block "
            "(reduction at block 0 is undefined; the reference crashes "
            "there, models/kmedoids.py:237-251)"
        )
        det = not train
        x = self.embed(x, deterministic=det)
        viz = {"Kept_Tokens": {}, "Assignment_Maps": {},
               "Center_Feats": {}, "Features": {}}
        cnt = 0
        colsum = None
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                prefix = x[:, : c.num_prefix_tokens]
                token_weights = None
                if not c.equal_weight:
                    token_weights = colsum[:, c.num_prefix_tokens:, None]
                key = None
                if c.equal_weight and self.has_rng("cluster"):
                    key = self.make_rng("cluster")
                centers, idx_centers, assignment = k_medoids_fit(
                    x[:, c.num_prefix_tokens:], self.schedule[cnt],
                    c.cluster_iters, token_weights, key=key,
                )
                if c.viz_mode:
                    viz["Kept_Tokens"][i] = idx_centers
                    viz["Assignment_Maps"][i] = assignment
                    viz["Center_Feats"][i] = centers
                x = jnp.concatenate([prefix, centers], axis=1)
                cnt += 1
            # attention column mass is only needed right before a reduction
            want = "colsum" if (i + 1) in c.reduction_loc else None
            x, aux = blk(x, score=want, deterministic=det)
            if aux is not None and aux[0] is not None:
                colsum = aux[0]
            if c.viz_mode and i in c.reduction_loc:
                viz["Features"][i] = x
        if c.viz_mode and (c.depth - 1) not in viz["Features"]:
            viz["Features"][c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, viz
        return out
