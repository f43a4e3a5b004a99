"""Multi-device correctness on the 8-virtual-CPU-device mesh (SURVEY §4
item 4): the sharded data-parallel train step must be numerically
identical to the single-device run on the same global batch (proving the
implicit psum XLA inserts -- the TPU-native replacement for the
reference's DDP allreduce, reference utils.py:216-238 / train.py:406),
rank-strided samplers must partition the index space, and eval metric
aggregation must match.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tokenreduction_tpu import create_model
from tokenreduction_tpu.data.sampler import (
    DistributedEvalSampler,
    RASampler,
    ShardedSampler,
)
from tokenreduction_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from tokenreduction_tpu.train import losses as L
from tokenreduction_tpu.train.mixup import MixupConfig, apply_mixup
from tokenreduction_tpu.train.optim import OptimConfig, create_optimizer
from tokenreduction_tpu.train.step import (
    StepConfig,
    TrainState,
    make_eval_step,
    make_train_step,
)

N_DEV = 8
TINY = dict(embed_dim=32, num_heads=2, depth=4, patch_size=8)


def _require_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"needs {N_DEV} virtual devices (conftest XLA_FLAGS)")


def _build(num_classes=7, mixup=True, opt="sgd"):
    module, cfg = create_model(
        "topk_small_patch16_224", num_classes=num_classes, img_size=32,
        reduction_loc=(1, 2), keep_rate=(0.7,), **TINY)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    tx, _ = create_optimizer(
        params, OptimConfig(opt=opt, lr=1e-3, clip_grad=1.0,
                            backbone_lr_scale=0.1),
        lambda s: 1e-3, [], steps_per_epoch=4)
    mix_fn = None
    if mixup:
        mix = MixupConfig(num_classes=num_classes)
        mix_fn = lambda k, im, lb: apply_mixup(k, im, lb, mix)  # noqa: E731
        loss_fn = lambda out, t, i, p: L.soft_target_ce(out, t)  # noqa: E731
    else:
        loss_fn = lambda out, t, i, p: L.label_smoothing_ce(  # noqa: E731
            out, t, 0.1)
    step = make_train_step(
        lambda p, im, train, rngs: module.apply(
            {"params": p}, im, train=train, rngs=rngs),
        loss_fn, tx,
        StepConfig(grad_accum_steps=2, ema_decay=0.99),
        mixup_fn=mix_fn)

    def init_state(p):
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=p,
            opt_state=tx.init(p),
            ema_params=jax.tree_util.tree_map(jnp.copy, p))

    return module, params, step, init_state


def _batch(num_classes=7, B=16, seed=1):
    return {
        "image": jax.random.normal(
            jax.random.PRNGKey(seed), (B, 32, 32, 3), jnp.float32),
        "label": jax.random.randint(
            jax.random.PRNGKey(seed + 1), (B,), 0, num_classes),
    }


def test_sharded_grads_match_single_device():
    """The psum proof: grads of the global-batch loss computed with the
    batch sharded over 8 devices equal the single-device grads to fp32
    reduction-order noise."""
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    module, cfg = create_model(
        "topk_small_patch16_224", num_classes=7, img_size=32,
        reduction_loc=(1, 2), keep_rate=(0.7,), **TINY)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    batch = _batch(B=16, seed=2)

    def loss(p, im, lb):
        out = module.apply({"params": p}, im, train=False)
        return L.label_smoothing_ce(out, lb, 0.1)

    gfn = jax.jit(jax.grad(loss))
    g_ref = gfn(params, batch["image"], batch["label"])
    sb = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    g_sh = gfn(replicate(params, mesh), sb["image"], sb["label"])
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sharded_train_step_matches_single_device():
    """2 sharded steps == 2 single-device steps on the same global batch,
    through the full step (mixup, grad-accum scan, clip, SGD, EMA). SGD
    keeps the update linear in the grads so the comparison stays at fp32
    reduction-order noise; the adamw variant below allows Adam's 1/sqrt(v)
    amplification of that noise."""
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    _, params, step, init_state = _build(opt="sgd")
    jstep = jax.jit(step)

    # single-device run (default placement)
    state_a = init_state(params)
    b1, b2 = _batch(seed=1), _batch(seed=5)
    state_a, m1 = jstep(state_a, b1, jax.random.PRNGKey(9))
    state_a, m2 = jstep(state_a, b2, jax.random.PRNGKey(10))

    # sharded run: params replicated, batch split over the data axis
    state_b = init_state(replicate(params, mesh))
    state_b = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state_b)
    sb1 = shard_batch({k: np.asarray(v) for k, v in b1.items()}, mesh)
    sb2 = shard_batch({k: np.asarray(v) for k, v in b2.items()}, mesh)
    state_b, s1 = jstep(state_b, sb1, jax.random.PRNGKey(9))
    state_b, s2 = jstep(state_b, sb2, jax.random.PRNGKey(10))

    np.testing.assert_allclose(
        float(s1["loss"]), float(m1["loss"]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        float(s2["loss"]), float(m2["loss"]), rtol=1e-6, atol=1e-6)
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.ema_params),
                    jax.tree_util.tree_leaves(state_b.ema_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-6)


def test_sharded_adamw_step_close_to_single_device():
    """Same equivalence through the grouped adamw path; tolerance covers
    1/sqrt(v) amplification of fp32 reduction-order noise at step 1."""
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    _, params, step, init_state = _build(opt="adamw", mixup=False)
    jstep = jax.jit(step)
    b = _batch(seed=11)
    state_a, m_a = jstep(init_state(params), b, jax.random.PRNGKey(4))
    state_b = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        init_state(replicate(params, mesh)))
    sb = shard_batch({k: np.asarray(v) for k, v in b.items()}, mesh)
    state_b, m_b = jstep(state_b, sb, jax.random.PRNGKey(4))
    np.testing.assert_allclose(
        float(m_b["loss"]), float(m_a["loss"]), rtol=1e-6, atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-3, atol=5e-5)


def test_sharded_step_outputs_stay_replicated():
    """Params/opt-state out of the sharded step must remain fully
    replicated -- no silent resharding that would break the next step."""
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    _, params, step, init_state = _build(mixup=False)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        init_state(params))
    batch = shard_batch(
        {k: np.asarray(v) for k, v in _batch().items()}, mesh)
    state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_eval_metrics_match_single_device():
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    module, cfg = create_model(
        "topk_small_patch16_224", num_classes=7, img_size=32,
        reduction_loc=(1, 2), keep_rate=(0.7,), **TINY)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    params = module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    eval_step = make_eval_step(
        lambda p, im, train, rngs: module.apply(
            {"params": p}, im, train=False))
    jeval = jax.jit(eval_step)
    batch = _batch(B=16, seed=3)

    ref = jeval(params, batch)
    sharded = jeval(
        replicate(params, mesh),
        shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh))
    assert int(sharded["correct1"]) == int(ref["correct1"])
    assert int(sharded["correct5"]) == int(ref["correct5"])
    assert int(sharded["count"]) == int(ref["count"]) == 16
    np.testing.assert_allclose(
        float(sharded["loss_sum"]), float(ref["loss_sum"]),
        rtol=1e-5, atol=1e-5)


def test_shard_batch_places_on_data_axis():
    _require_devices()
    mesh = data_parallel_mesh(N_DEV)
    batch = shard_batch({"image": np.zeros((16, 4, 4, 3))}, mesh)
    sh = batch["image"].sharding
    assert sh == NamedSharding(mesh, P("data", None, None, None)) or \
        sh.spec[0] == "data"
    assert batch_sharding(mesh).spec == P("data")


# ----------------------------------------------------------- samplers
def test_sharded_sampler_rank_splits_partition():
    n, world = 103, N_DEV
    samplers = [ShardedSampler(n, world, r, seed=7) for r in range(world)]
    for s in samplers:
        s.set_epoch(3)
    shards = [list(s) for s in samplers]
    sizes = {len(s) for s in shards}
    assert sizes == {samplers[0].num_samples}
    allidx = [i for s in shards for i in s]
    # padded to a multiple of world: every real index covered, duplicates
    # only from the pad (reference samplers semantics)
    assert set(allidx) == set(range(n))
    assert len(allidx) == samplers[0].total_size
    counts = np.bincount(allidx, minlength=n)
    assert counts.max() <= 2 and (counts == 2).sum() == len(allidx) - n
    # different epochs give different orders, same partition property
    for s in samplers:
        s.set_epoch(4)
    shards2 = [list(s) for s in samplers]
    assert shards2 != shards
    assert set(i for s in shards2 for i in s) == set(range(n))


def test_ra_sampler_rank_splits():
    """RASampler: 3x repeats spread across ranks; per-rank truncation to
    floor(n//256*256/world) (reference samplers.py:31-57)."""
    n, world = 512, N_DEV
    samplers = [RASampler(n, world, r, num_repeats=3, seed=1)
                for r in range(world)]
    shards = [list(s) for s in samplers]
    expect_len = int(np.floor(n // 256 * 256 / world))
    assert all(len(s) == expect_len for s in shards)
    # before truncation the repeated stream partitions exactly:
    full = []
    for s in samplers:
        if s.shuffle:
            g = np.random.default_rng(s.seed + s.epoch)
            idx = g.permutation(n)
        idx = np.repeat(idx, 3)
        pad = s.total_size - len(idx)
        idx = np.concatenate([idx, idx[:pad]]) if pad > 0 else idx
        full.append(idx[s.rank:s.total_size:s.num_replicas])
    counts = np.bincount(np.concatenate(full), minlength=n)
    assert (counts >= 3).all()  # every sample repeated >= num_repeats


def test_eval_sampler_sequential_partition():
    n, world = 37, N_DEV
    shards = [list(DistributedEvalSampler(n, world, r))
              for r in range(world)]
    allidx = [i for s in shards for i in s]
    assert set(allidx) == set(range(n))
    # sequential: rank r takes indices r, r+world, ...
    assert shards[0][:3] == [0, world, 2 * world]


def test_tp_sharded_step_matches_single_device():
    """2-D data x model mesh: attention/MLP weight matrices sharded
    megatron-style over the model axis (column-split fc1/qkv, row-split
    fc2/proj). One SGD step must match the single-device step -- proves
    the psum XLA inserts on the row-parallel outputs."""
    _require_devices()
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:N_DEV]).reshape(N_DEV // 2, 2)
    mesh = Mesh(devices, axis_names=("data", "model"))
    _, params, step, init_state = _build(opt="sgd", mixup=False)
    jstep = jax.jit(step)
    b = _batch(seed=21)
    state_a, m_a = jstep(init_state(params), b, jax.random.PRNGKey(6))

    def tp_spec(path, p):
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        if getattr(p, "ndim", 0) == 2 and "patch_embed" not in name:
            if "fc1" in name or "qkv" in name:
                return NamedSharding(mesh, P(None, "model"))
            if "fc2" in name or "proj" in name:
                return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda pth, p: jax.device_put(p, tp_spec(pth, p)), tree)

    params_tp = shard_tree(params)
    state_b = init_state(params_tp)
    state_b = TrainState(
        step=jax.device_put(state_b.step, NamedSharding(mesh, P())),
        params=state_b.params, opt_state=state_b.opt_state,
        ema_params=shard_tree(params))
    sb = {k: jax.device_put(np.asarray(v), NamedSharding(mesh, P("data")))
          for k, v in b.items()}
    state_b, m_b = jstep(state_b, sb, jax.random.PRNGKey(6))
    np.testing.assert_allclose(
        float(m_b["loss"]), float(m_a["loss"]), rtol=1e-6, atol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-6)


def test_fsdp_sharded_step_matches_single_device():
    """FSDP/ZeRO-3: params (and therefore optimizer moments + EMA, which
    inherit the sharding through tx.init/copy) sharded over the data
    axis; XLA inserts the all-gather per use and the reduce-scatter on
    the grads. One SGD step must match the single-device step."""
    _require_devices()
    from tokenreduction_tpu.parallel.mesh import fsdp_shardings

    mesh = data_parallel_mesh(N_DEV)
    _, params, step, init_state = _build(opt="sgd", mixup=False)
    jstep = jax.jit(step)
    b = _batch(seed=31)
    state_a, m_a = jstep(init_state(params), b, jax.random.PRNGKey(8))

    shardings = fsdp_shardings(params, mesh, min_size=64)
    # at least one leaf must actually be sharded for this to test FSDP
    assert any(not s.is_fully_replicated
               for s in jax.tree_util.tree_leaves(shardings))
    params_f = jax.tree_util.tree_map(jax.device_put, params, shardings)
    state_b = init_state(params_f)
    state_b = TrainState(
        step=jax.device_put(state_b.step, NamedSharding(mesh, P())),
        params=state_b.params, opt_state=state_b.opt_state,
        ema_params=jax.tree_util.tree_map(
            jax.device_put, params, shardings))
    sb = shard_batch({k: np.asarray(v) for k, v in b.items()}, mesh)
    state_b, m_b = jstep(state_b, sb, jax.random.PRNGKey(8))
    np.testing.assert_allclose(
        float(m_b["loss"]), float(m_a["loss"]), rtol=1e-6, atol=1e-6)
    # outputs keep the FSDP sharding (no silent replication blow-up)
    out_sh = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, state_b.params))
    assert any(not s.is_fully_replicated for s in out_sh)
    for a, c in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-5, atol=2e-6)


def test_fsdp_resume_resharding_restores_moment_sharding():
    """Resume with --fsdp (ADVICE r2): checkpoint-restored optimizer
    moments arrive as host (replicated) arrays; reshard_restored_opt_state
    must put them back on the live state's ZeRO-3 shardings -- otherwise
    a resumed run replicates every Adam moment on every device. Leaves
    whose live counterpart is uncommitted (step counts) must pass through
    untouched."""
    _require_devices()
    from tokenreduction_tpu.parallel.mesh import fsdp_shardings
    from tokenreduction_tpu.train.loop import reshard_restored_opt_state

    mesh = data_parallel_mesh(N_DEV)
    _, params, _, init_state = _build(opt="adamw")
    shardings = fsdp_shardings(params, mesh, min_size=64)
    assert any(not s.is_fully_replicated
               for s in jax.tree_util.tree_leaves(shardings))
    params_f = jax.tree_util.tree_map(jax.device_put, params, shardings)
    live = init_state(params_f)  # opt_state inherits the FSDP shardings

    # "restored": host numpy copies, as load_checkpoint hands them back
    restored = jax.tree_util.tree_map(np.asarray, live.opt_state)
    resharded = reshard_restored_opt_state(restored, live.opt_state)

    n_sharded = 0
    for r, l in zip(jax.tree_util.tree_leaves(resharded),
                    jax.tree_util.tree_leaves(live.opt_state)):
        if isinstance(getattr(l, "sharding", None), NamedSharding):
            assert r.sharding == l.sharding
            n_sharded += not l.sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(r), np.asarray(l))
    assert n_sharded > 0, "no moment leaf was actually FSDP-sharded"


def test_train_cli_fsdp_resume_smoke(tmp_path):
    """--fsdp + --resume through the CLI: the restored run must complete
    a further epoch on the 8-device mesh (exercises the opt_state
    resharding path end-to-end)."""
    _require_devices()
    import os

    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "run")
    common = [
        "--model", "topk_tiny_patch16_224", "--dataset", "synthetic",
        "--synthetic-n", "16", "--synthetic-classes", "5",
        "--input-size", "32", "--batch-size", "8",
        "--embed-dim", "16", "--depth", "2", "--num-heads", "2",
        "--patch-size", "8", "--reduction_loc", "1", "--keep_rate",
        "0.7", "--warmup-epochs", "0", "--no-repeated-aug", "--fsdp",
        "--save_more_than_best", "--print-freq", "100",
        "--output_dir", out,
    ]
    main(common + ["--epochs", "1"])
    ckpt = os.path.join(out, "checkpoint")
    assert os.path.isdir(ckpt)
    main(common + ["--epochs", "2", "--resume", ckpt])
    with open(os.path.join(out, "log.txt")) as f:
        epochs = [json.loads(line)["epoch"] for line in f]
    assert max(epochs) >= 1


def test_train_cli_fsdp_device_aug_smoke(tmp_path):
    """--fsdp + --device_aug together through the CLI on the 8-device
    CPU mesh: params shard, uint8 batches augment on-device."""
    _require_devices()
    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "run")
    main([
        "--model", "topk_tiny_patch16_224", "--dataset", "synthetic",
        "--synthetic-n", "16", "--synthetic-classes", "5",
        "--input-size", "32", "--batch-size", "8", "--epochs", "1",
        "--embed-dim", "16", "--depth", "2", "--num-heads", "2",
        "--patch-size", "8", "--reduction_loc", "1", "--keep_rate",
        "0.7", "--warmup-epochs", "0", "--no-repeated-aug", "--fsdp",
        "--device_aug", "--aa", "", "--print-freq", "100",
        "--output_dir", out,
    ])
    import os
    assert os.path.isdir(os.path.join(out, "best_checkpoint"))


def test_dryrun_multichip_warning_clean():
    """The driver-facing dryrun (__graft_entry__.dryrun_multichip) must
    pass AND emit zero XLA SPMD "Involuntary full rematerialization"
    warnings -- resharding fallbacks that would be wasted interconnect
    on a real slice. dryrun_multichip itself raises on any such stderr
    line (it re-execs a child and scans the log); this test just runs it
    end-to-end the way the driver does, from a TPU-or-CPU parent."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rematerialization" not in r.stderr
    assert r.stdout.count("ok on cpu") == 3, r.stdout
