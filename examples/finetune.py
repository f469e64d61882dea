#!/usr/bin/env python
"""Fine-tuning example (beyond the reference, which ships no training).

Builds a batch-sharded optax train step over a device mesh and fits the
model to a synthetic denoising task — the minimal template for fine-tuning
converted checkpoints on real paired (noisy, clean) data.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python examples/finetune.py --steps 10
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dpdfnet2")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import optax

    from dpdfnet_tpu import train
    from dpdfnet_tpu.config import get_config
    from dpdfnet_tpu.models.params import init_params
    from dpdfnet_tpu.parallel import mesh as pmesh

    cfg = get_config(args.model)
    params = init_params(cfg, seed=0)   # or models.convert.load_params(ckpt)

    mesh = None
    if jax.device_count() > 1:
        mesh = pmesh.make_mesh(jax.devices())
        print(f"[INFO] data-parallel over {jax.device_count()} devices")

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    step = train.make_train_step(cfg, opt, mesh=mesh)

    S = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    t = np.arange(S) / cfg.sample_rate
    clean = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    clean = np.tile(clean, (args.batch, 1))

    for i in range(args.steps):
        noisy = clean + 0.1 * rng.normal(size=clean.shape).astype(np.float32)
        if mesh is not None:
            noisy = jax.device_put(noisy, pmesh.batch_sharding(mesh))
            clean_d = jax.device_put(clean, pmesh.batch_sharding(mesh))
        else:
            clean_d = clean
        params, opt_state, loss, aux = step(params, opt_state, noisy, clean_d)
        print(f"step {i:3d}  loss {float(loss):.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
