"""All-methods full-model eval parity: TPU Pallas kernels vs XLA.

The CPU test suite proves the fused kernels in *interpret* mode; this
tool proves the *compiled Mosaic* kernels on the real chip, for every
method at production DeiT-S shapes (D=384, schedule off 197 tokens) --
including the small-width paths only a keep-0.25 schedule reaches
(head-stacked block-diagonal attention at N <= 24, whole-block fusion,
rectangular ATS kernels).

Two phases, one command (`python tools/tpu_parity.py`):

1. A forced-CPU subprocess initializes each config and saves the exact
   param tree + reference logits (XLA, highest matmul precision).
2. The TPU phase reloads those params (no reliance on cross-backend
   init determinism) and checks two gates per config:

   A. **platform gate** -- TPU *XLA* path (TOKENREDUCTION_USE_PALLAS=0,
      highest precision) vs the CPU reference, strict 1e-4: the
      bit-stable extraction contract's compute path.
   B. **strict Mosaic gate** -- TPU Pallas path with
      TOKENREDUCTION_KERNEL_MATMUL_PRECISION=highest (fp32-precise
      Mosaic dots) vs the fp32 XLA path: a hard 1e-4 bound for EVERY
      method, no selection flips possible (measured 2e-6).
   C. **production numerics report** -- the Pallas path at its pinned
      default matmul precision (what serving runs), fp32 and bf16:
      drift is ~1e-2 and, with random weights, near-tied scores let a
      boundary kept-token flip legitimately cascade on hard-selection
      methods (topk/evit/tome/dpcknn/kmedoids/dyvit/ats; ATS's
      inverse-transform sampling flips on nearly every image). Flips
      are REPORTED for selection methods and gated to zero for the
      others (deit/heuristic/sit/patchmerger/sinkhorn). This asymmetry
      is exactly why viz_mode pins the XLA composition -- see README
      "Fidelity".

Measured (2026-08, v5e, b8 random weights): platform gate ~2e-6
(sinkhorn 5e-5, extra OT iterations); strict Mosaic gate ~2e-6 on
full-model logits for all 16 configs; production fp32/bf16 drift
median ~1e-2 on logit scale ~1.3.
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
# hard token selection in the eval forward: near-tied random-weight
# scores can flip a boundary token between numerics regimes
SELECTING = {"topk", "evit", "tome", "dpcknn", "kmedoids", "dyvit",
             "ats"}
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
        leaves = jax.tree_util.tree_leaves(params)
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
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np

    ref = np.load(args.ref)
    platform = jax.devices()[0].platform
    x = jax.numpy.asarray(ref["x"])
    B = int(ref["x"].shape[0])
    failures = []
    rows = []
    for name, method, keep in configs(args.methods):
        module, _ = build(method, keep)
        template = jax.eval_shape(
            lambda m=module: m.init({"params": jax.random.PRNGKey(0)},
                                    x, train=False)["params"])
        treedef = jax.tree_util.tree_structure(template)
        params = jax.tree_util.tree_unflatten(
            treedef, [ref[f"{name}/p{i}"]
                      for i in range(treedef.num_leaves)])

        bparams = jax.tree_util.tree_map(
            lambda p: p.astype(jax.numpy.bfloat16)
            if np.issubdtype(p.dtype, np.floating) else p, params)
        bx = x.astype(jax.numpy.bfloat16)

        def run(pallas, kernel_prec=None, bf16=False):
            os.environ["TOKENREDUCTION_USE_PALLAS"] = "1" if pallas \
                else "0"
            if kernel_prec:
                os.environ["TOKENREDUCTION_KERNEL_MATMUL_PRECISION"] = \
                    kernel_prec
            try:
                p_, x_ = (bparams, bx) if bf16 else (params, x)
                out = jax.jit(lambda p, x, m=module: m.apply(
                    {"params": p}, x, train=False))(p_, x_)
            finally:
                os.environ.pop("TOKENREDUCTION_USE_PALLAS", None)
                os.environ.pop("TOKENREDUCTION_KERNEL_MATMUL_PRECISION",
                               None)
            return np.asarray(out[0] if isinstance(out, tuple) else out,
                              dtype=np.float32)

        xla_logits = run(pallas=False)
        strict_logits = run(pallas=True, kernel_prec="highest")
        prod_logits = run(pallas=True)
        bf16_xla = run(pallas=False, bf16=True)
        bf16_pallas = run(pallas=True, bf16=True)

        # gate A: TPU XLA vs CPU XLA (platform stability, strict)
        plat_d = float(np.abs(xla_logits - ref[f"{name}/logits"]).max())
        plat_ok = plat_d <= args.platform_tol
        # gate B: compiled Mosaic at fp32/highest vs fp32 XLA -- both
        # sides fp32-precise, so this is a strict correctness gate with
        # no selection flips possible (measured 2e-6, all methods)
        strict_d = float(np.abs(strict_logits - xla_logits).max())
        strict_ok = strict_d <= args.strict_tol
        # production numerics (informational for selection methods: on
        # near-tied random-weight scores a boundary kept-token flip
        # legitimately cascades; ATS's inverse-transform sampling flips
        # on nearly every image at ~1e-2 score drift)
        per_img = np.abs(prod_logits - xla_logits).reshape(B, -1).max(1)
        flips = int((per_img > args.tol).sum())
        bf_img = np.abs(bf16_pallas - bf16_xla).reshape(B, -1).max(1)
        bf_flips = int((bf_img > args.bf16_tol).sum())
        if method in SELECTING:
            prod_ok = True  # gated by the strict fp32/highest leg above
        else:
            prod_ok = flips == 0 and bf_flips == 0
        ok = plat_ok and strict_ok and prod_ok
        rows.append({"config": name, "platform_max_d": plat_d,
                     "strict_max_d": strict_d,
                     "prod_drift_median": float(np.median(per_img)),
                     "prod_flips": flips,
                     "bf16_drift_median": float(np.median(bf_img)),
                     "bf16_flips": bf_flips, "ok": ok})
        print(f"[{platform}] {name:16s} platform|d|={plat_d:.1e} "
              f"strict|d|={strict_d:.1e} "
              f"prod|d| med={np.median(per_img):.1e} flips={flips}/{B} "
              f"bf16|d| med={np.median(bf_img):.1e} "
              f"flips={bf_flips}/{B} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(name)
    print(json.dumps({"platform": platform, "tol": args.tol,
                      "platform_tol": args.platform_tol,
                      "strict_tol": args.strict_tol, "batch": B,
                      "rows": rows}))
    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    print(f"all {len(rows)} configs pass (platform + strict Mosaic "
          f"gates hard; production drift within {args.tol} modulo "
          f"documented selection flips)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tol", type=float, default=5e-2,
                    help="per-image Pallas-vs-XLA logit drift bound")
    ap.add_argument("--platform-tol", type=float, default=1e-4,
                    help="TPU-XLA vs CPU-XLA bound (highest precision)")
    ap.add_argument("--strict-tol", type=float, default=1e-4,
                    help="compiled-Mosaic fp32/highest vs fp32 XLA "
                    "bound (both fp32-precise; measured 2e-6)")
    ap.add_argument("--bf16-tol", type=float, default=1e-1,
                    help="per-image bound for the bf16 serving config "
                    "(both paths quantize; kernels use tanh-GELU)")
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
