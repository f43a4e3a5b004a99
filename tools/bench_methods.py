"""Per-method / per-capacity / per-keep-rate eval throughput (TPU).

Reuses bench.py's chained-scan measurement (no elidable work, host-fetch
sync, fixed dispatch overhead subtracted). Produces the README
"Performance" tables.

  python tools/bench_methods.py --axis methods   # 11 methods @ 0.7
  python tools/bench_methods.py --axis capacity  # tiny/small/base
  python tools/bench_methods.py --axis rates     # keep 0.9/0.7/0.5/0.25
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import (  # noqa: E402
    V5E_BF16_PEAK,
    bench_one,
    bench_train,
    make_chain,
    model_flops,
)

METHODS = [
    "topk", "evit", "tome", "sit", "patchmerger", "sinkhorn",
    "dpcknn", "kmedoids", "dyvit", "ats", "heuristic",
]


def run(name, **kw):
    ips = bench_one(*make_chain(name, **kw))
    print(f"{name} {kw.get('keep_rate', '')}: {ips:,.0f} img/s",
          flush=True)
    return ips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--axis", default="methods",
                    choices=["methods", "capacity", "rates"])
    ap.add_argument("--train", action="store_true",
                    help="capacity axis: also measure the full train "
                         "step (fwd+bwd+opt, amp) per capacity -- "
                         "adjudicates the D=768 XLA-fallback decision "
                         "with numbers (the whole-branch Pallas train "
                         "kernels gate off at base capacity; see "
                         "core/layers.py::_pallas_train_eligible)")
    args = ap.parse_args()
    if args.axis == "methods":
        for m in METHODS:
            run(f"{m}_small_patch16_224", reduction_loc=(3, 6, 9),
                keep_rate=(0.7,))
    elif args.axis == "capacity":
        for size in ("tiny", "small", "base"):
            dense = run(f"deit_{size}_patch16_224_local")
            red = run(f"topk_{size}_patch16_224", reduction_loc=(3, 6, 9),
                      keep_rate=(0.7,))
            print(f"  {size}: {red / dense:.2f}x vs dense", flush=True)
            if args.train:
                ips = bench_train(f"topk_{size}_patch16_224")
                f = model_flops(f"topk_{size}_patch16_224",
                                reduction_loc=(3, 6, 9), keep_rate=(0.7,))
                mfu = ips * 3 * f / V5E_BF16_PEAK
                print(f"  {size} train topk@0.7: {ips:,.0f} img/s "
                      f"MFU {mfu:.3f}", flush=True)
    else:
        dense = run("deit_small_patch16_224_local")
        for r in (0.9, 0.7, 0.5, 0.25):
            red = run("topk_small_patch16_224", reduction_loc=(3, 6, 9),
                      keep_rate=(r,))
            print(f"  keep {r}: {red / dense:.2f}x vs dense", flush=True)


if __name__ == "__main__":
    main()
