"""Every registry model builds, runs train+eval forward under jit, and
produces statically-shaped outputs (SURVEY.md section 4: static-shape/jit)."""

import jax
import jax.numpy as jnp
import pytest

from tokenreduction_tpu import create_model, list_models

TINY = dict(
    img_size=32,
    num_classes=11,
    embed_dim=32,
    num_heads=2,
    depth=6,
    patch_size=8,  # 4x4 = 16 patches
)
LOC = (1, 3)
RATE = (0.7,)

ALL_METHODS = [
    "topk", "evit", "tome", "sit", "patchmerger", "sinkhorn",
    "dpcknn", "kmedoids", "dyvit", "ats", "heuristic",
]


def build(method, viz=False, **kw):
    name = f"{method}_small_patch16_224"
    over = dict(TINY)
    over.update(reduction_loc=LOC, keep_rate=RATE, viz_mode=viz)
    over.update(kw)
    return create_model(name, num_classes=over.pop("num_classes"),
                        img_size=over.pop("img_size"), **over)


def init_and_run(module, train, rngs_extra=(), batch=2, img=32):
    x = jnp.ones((batch, img, img, 3), dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(hash(name) % 2**31)
    variables = module.init(rngs, x, train=False)
    run_rngs = {k: v for k, v in rngs.items() if k != "params"}

    @jax.jit
    def fwd(params, x):
        return module.apply(params, x, train=train,
                            rngs=run_rngs or None)

    return fwd(variables, x)


def test_registry_has_all_families():
    names = list_models()
    for m in ALL_METHODS + ["deit"]:
        assert any(n.startswith(m) for n in names), m
    assert "dyvit_small_patch16_224_teacher" in names
    assert "deit_small_patch16_224_local_viz" in names


def test_dense_deit_runs():
    module, cfg = create_model(
        "deit_small_patch16_224_local",
        num_classes=TINY["num_classes"], img_size=TINY["img_size"],
        embed_dim=32, num_heads=2, depth=4, patch_size=8,
    )
    out = init_and_run(module, train=False)
    assert out.shape == (2, 11)


def test_teacher_returns_tokens():
    module, cfg = create_model(
        "dyvit_small_patch16_224_teacher",
        num_classes=TINY["num_classes"], img_size=TINY["img_size"],
        embed_dim=32, num_heads=2, depth=4, patch_size=8,
    )
    cls, tokens = init_and_run(module, train=False)
    assert cls.shape == (2, 11)
    assert tokens.shape == (2, 16, 32)


@pytest.mark.parametrize("method", ALL_METHODS)
def test_eval_forward(method):
    module, cfg = build(method)
    rngs = ("cluster",) if method in ("dpcknn",) else ()
    out = init_and_run(module, train=False, rngs_extra=rngs)
    assert out.shape == (2, 11)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("method", ALL_METHODS)
def test_train_forward(method):
    module, cfg = build(method)
    rngs = ["dropout", "droppath"]
    if method == "dyvit":
        rngs.append("gumbel")
    if method == "dpcknn":
        rngs.append("cluster")
    out = init_and_run(module, train=True, rngs_extra=rngs)
    if method == "dyvit":
        logits, out_pred_prob = out
        assert logits.shape == (2, 11)
        assert len(out_pred_prob) == len(LOC)
    else:
        assert out.shape == (2, 11)


@pytest.mark.parametrize("method", ALL_METHODS)
def test_viz_forward(method):
    module, cfg = build(method, viz=True)
    rngs = ("cluster",) if method in ("dpcknn",) else ()
    out, viz = init_and_run(module, train=False, rngs_extra=rngs)
    assert out.shape == (2, 11)
    assert "Features" in viz
    # final block features always present (reference models/topk.py:199-200)
    assert (cfg.depth - 1) in viz["Features"] or any(
        k == cfg.depth - 1 for k in viz["Features"]
    )
    key_by_family = {
        "topk": "Kept_Tokens", "evit": "Kept_Tokens", "dyvit": "Kept_Tokens",
        "ats": "Kept_Tokens", "dpcknn": "Kept_Tokens",
        "kmedoids": "Kept_Tokens", "tome": "Assignment_Maps",
        "sit": "Assignment_Maps", "patchmerger": "Assignment_Maps",
        "sinkhorn": "Assignment_Maps", "heuristic": "Kept_Tokens_Abs",
    }
    k = key_by_family[method]
    assert k in viz and len(viz[k]) == len(
        LOC if method != "heuristic" else range(LOC[0], LOC[-1] + 1)
    )


def test_token_shapes_shrink():
    """Static shape schedule: topk keeps int(r^(s+1) * N) patches."""
    module, cfg = build("topk", viz=True)
    out, viz = init_and_run(module, train=False)
    n = cfg.num_patches
    k1 = int(0.7 * n)
    k2 = int(0.7 ** 2 * n)
    assert viz["Kept_Tokens"][LOC[0]].shape == (2, k1)
    assert viz["Kept_Tokens"][LOC[1]].shape == (2, k2)
    assert viz["Features"][LOC[1]].shape == (2, k2 + 1, cfg.embed_dim)


@pytest.mark.parametrize("method", ALL_METHODS)
def test_eval_forward_distilled(method):
    """Every family also builds and runs with the DeiT-distilled
    backbone (dist token in the prefix; eval logits averaged over both
    heads) -- the reference constructs every method over the distilled
    weights whenever --distillation_type != none (models_act.py:54-60).
    dyvit is the exception: the reference's own forward never handles
    the dist token (dyvit.py:205-214), so building it must raise."""
    if method == "dyvit":
        with pytest.raises(ValueError, match="DeiT-distilled"):
            build(method, distilled=True)
        return
    module, cfg = build(method, distilled=True)
    rngs = ("dropout", "droppath") if method != "dpcknn" else \
        ("dropout", "droppath", "cluster")
    out = init_and_run(module, train=False, rngs_extra=rngs)
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape == (2, 11)
    assert bool(jnp.isfinite(logits).all())
