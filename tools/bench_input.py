"""Input-pipeline benchmark: host PIL augmentation vs raw uint8 collate
(device-side augmentation path), plus the on-chip augmentation cost
inside a train-sized jitted program.

Usage:
  python tools/bench_input.py --host        # host loader rates (CPU)
  python tools/bench_input.py --device      # on-chip aug cost (TPU ok)
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_host(n=512, cache_size=256, input_size=224, batch=64):
    import numpy as np

    from tokenreduction_tpu.data.cache import (
        DecodedCacheDataset, build_decoded_cache)
    from tokenreduction_tpu.data.datasets import build_dataset
    from tokenreduction_tpu.data.pipeline import (
        Loader, TransformConfig, make_raw_transform, make_transform)
    from tokenreduction_tpu.data.sampler import ShardedSampler
    import shutil
    import tempfile

    ds, _ = build_dataset("", "synthetic", "train", num_classes=10,
                          img_size=cache_size, synthetic_n=n)
    tmp = tempfile.mkdtemp(prefix="cachebench")
    import atexit
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    t0 = time.time()
    build_decoded_cache(ds, tmp, cache_size=cache_size)
    print(f"cache build: {n / (time.time() - t0):.0f} img/s")
    cds = DecodedCacheDataset(tmp)

    tcfg = TransformConfig(input_size=input_size)
    for name, tf in (
            ("host PIL aug (RRC+RA+erase)",
             make_transform("imagenet", True, tcfg)),
            ("raw uint8 collate (device-aug feed)",
             make_raw_transform(cache_size))):
        loader = Loader(cds, ShardedSampler(len(cds), 1, 0), batch, tf,
                        drop_last=True)
        it = iter(loader)
        next(it)  # warm
        t0 = time.time()
        cnt = batch
        for b in it:
            cnt += b["image"].shape[0]
        dt = time.time() - t0
        print(f"{name}: {(cnt - batch) / dt:.0f} img/s "
              f"(batch {batch}, {cnt - batch} imgs)")


def bench_device(batch=256, size=224, src=256, iters=10):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
    from tokenreduction_tpu.data.device_aug import (
        DeviceAugConfig, make_device_augment)

    aug = make_device_augment(DeviceAugConfig(input_size=size))
    u8 = jax.random.randint(jax.random.PRNGKey(0),
                            (batch, src, src, 3), 0, 256, jnp.uint8)

    def chain(key, u8, n):
        def body(carry, _):
            k, acc = carry
            k, ka = jax.random.split(k)
            out = aug(ka, u8)
            return (k, acc + out.mean()), None

        (_, acc), _ = jax.lax.scan(body, (key, jnp.zeros(())), None,
                                   length=n)
        return acc

    from functools import partial
    chain = jax.jit(partial(chain), static_argnums=2)
    float(chain(jax.random.PRNGKey(1), u8, iters))  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(chain(jax.random.PRNGKey(2), u8, iters))
        best = min(best, time.time() - t0 - 0.027)
    per_batch = best / iters
    print(f"device aug: {per_batch * 1e3:.2f} ms per b{batch} "
          f"({batch / per_batch:.0f} img/s if aug-bound)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", action="store_true")
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--n", type=int, default=512)
    args = ap.parse_args()
    if args.host:
        bench_host(n=args.n)
    if args.device:
        bench_device()
