"""All-methods full-model eval parity: TPU Pallas kernels vs CPU XLA.

The CPU test suite proves the fused kernels in *interpret* mode; this
tool proves the *compiled Mosaic* kernels on the real chip, for every
method at production DeiT-S shapes (D=384, schedule off 197 tokens) --
including the small-width paths only a keep-0.25 schedule reaches
(head-stacked block-diagonal attention at N <= 24, whole-block fusion,
rectangular ATS kernels).

Two phases, one command:
  python tools/tpu_parity.py            # spawns the CPU phase, then runs TPU
The CPU phase (forced-CPU subprocess, XLA, highest matmul precision)
initializes each config, saves the exact param tree + reference logits;
the TPU phase reloads those params (so both sides run identical weights
-- no reliance on cross-backend init determinism), runs the Pallas eval
path, and gates on max|dlogits| and top-1 agreement.

Expected drift: Mosaic fp32 matmul precision differs from XLA's by
<= ~2e-2 on logits (BASELINE.md / README "Fidelity"); top-1 must match
exactly on random inputs (logit gaps >> 2e-2 at DeiT scale).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

METHODS = [
    "deit", "topk", "evit", "tome", "sit", "patchmerger", "sinkhorn",
    "dpcknn", "kmedoids", "dyvit", "ats", "heuristic",
]
# the keep-0.25 schedule (197 -> 50 -> 13 -> 4) exercises the stacked
# attention + whole-block kernels; one method per reduction family
KEEP025 = ["topk", "evit", "tome", "sinkhorn"]


def configs(methods):
    out = []
    for m in methods:
        out.append((f"{m}@0.7", m, (0.7,)))
    for m in methods:
        if m in KEEP025:
            out.append((f"{m}@0.25", m, (0.25,)))
    return out


def build(method, keep):
    from tokenreduction_tpu import create_model

    if method == "deit":
        return create_model("deit_small_patch16_224_local",
                            num_classes=1000)
    return create_model(f"{method}_small_patch16_224", num_classes=1000,
                        reduction_loc=(3, 6, 9), keep_rate=keep)


def flatten(params):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params)
    return leaves, treedef


def cpu_phase(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
    import jax.numpy as jnp
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(7),
                          (args.batch, 224, 224, 3), jnp.float32)
    blobs = {"x": np.asarray(x)}
    for name, method, keep in configs(args.methods):
        module, _ = build(method, keep)
        params = jax.jit(lambda m=module: m.init(
            {"params": jax.random.PRNGKey(0)}, x,
            train=False)["params"])()
        out = jax.jit(lambda p, x, m=module: m.apply(
            {"params": p}, x, train=False))(params, x)
        logits = out[0] if isinstance(out, tuple) else out
        leaves, _ = flatten(params)
        blobs[f"{name}/logits"] = np.asarray(logits)
        for i, leaf in enumerate(leaves):
            blobs[f"{name}/p{i}"] = np.asarray(leaf)
        print(f"[cpu] {name}: logits {logits.shape}, "
              f"{len(leaves)} param leaves", flush=True)
    np.savez(args.ref, **blobs)
    print(f"[cpu] wrote {args.ref}")


def tpu_phase(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
    import numpy as np

    ref = np.load(args.ref)
    platform = jax.devices()[0].platform
    x = jax.numpy.asarray(ref["x"])
    failures = []
    rows = []
    for name, method, keep in configs(args.methods):
        module, _ = build(method, keep)
        # reuse the CPU phase's exact params via the same treedef
        template = jax.eval_shape(
            lambda m=module: m.init({"params": jax.random.PRNGKey(0)},
                                    x, train=False)["params"])
        _, treedef = flatten(template)
        n = treedef.num_leaves
        params = jax.tree_util.tree_unflatten(
            treedef, [ref[f"{name}/p{i}"] for i in range(n)])
        out = jax.jit(lambda p, x, m=module: m.apply(
            {"params": p}, x, train=False))(params, x)
        logits = np.asarray(out[0] if isinstance(out, tuple) else out)
        want = ref[f"{name}/logits"]
        maxd = float(np.abs(logits - want).max())
        scale = float(np.abs(want).max())
        top1_ok = bool((logits.argmax(-1) == want.argmax(-1)).all())
        ok = maxd <= args.tol and top1_ok
        rows.append({"config": name, "max_abs_dlogits": maxd,
                     "logit_scale": scale, "top1_match": top1_ok,
                     "ok": ok})
        print(f"[{platform}] {name:16s} max|dlogits|={maxd:.2e} "
              f"(scale {scale:.1f}) top1_match={top1_ok} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(name)
    print(json.dumps({"platform": platform, "tol": args.tol,
                      "batch": int(ref["x"].shape[0]), "rows": rows}))
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    print(f"all {len(rows)} configs within {args.tol} with exact top-1")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tol", type=float, default=5e-2)
    ap.add_argument("--methods", nargs="*", default=METHODS)
    ap.add_argument("--ref", default="/tmp/tpu_parity_ref.npz")
    ap.add_argument("--cpu-phase", action="store_true",
                    help="internal: compute the CPU reference and exit")
    ap.add_argument("--reuse-ref", action="store_true",
                    help="skip the CPU phase if --ref already exists")
    args = ap.parse_args()
    if args.cpu_phase:
        return cpu_phase(args)
    if not (args.reuse_ref and os.path.exists(args.ref)):
        cmd = [sys.executable, __file__, "--cpu-phase", "--ref", args.ref,
               "--batch", str(args.batch), "--methods", *args.methods]
        subprocess.run(cmd, check=True)
    return tpu_phase(args)


if __name__ == "__main__":
    sys.exit(main())
