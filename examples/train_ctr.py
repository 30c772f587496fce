"""Example: train the ctr production model from a model_parameter.json config
on synthetic data (single chip or a mesh).

    python examples/train_ctr.py --steps 200 --batch-size 4096
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from recommendsystem_tpu.core.config import load_model_parameter_json
from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.train import evaluate, fit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "ctr_model_parameter.json"))
    ap.add_argument("--model", default="ctr", choices=["ctr", "autoint"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--bucket-size", type=int, default=65536)
    ap.add_argument("--sparse-lr", type=float, default=5e-5)
    ap.add_argument("--dense-lr", type=float, default=5e-5)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    cfg = load_model_parameter_json(args.config)
    kwargs = dict(cfg=cfg, bucket_size=args.bucket_size,
                  sparse_lr=args.sparse_lr, dense_lr=args.dense_lr)
    if args.model == "autoint":
        # autoint needs uniform field widths; strip bias features
        from recommendsystem_tpu.core.config import synthetic_ctr_config
        kwargs["cfg"] = synthetic_ctr_config(num_slots=24, emb_sizes=(8,), num_bias=0)
    bundle = create_model(args.model, **kwargs)

    ds = (synthetic_batch(bundle, args.batch_size, seed=i)
          for i in range(args.steps))
    import logging
    logging.basicConfig(level=logging.INFO)
    state = fit(bundle, ds, steps=args.steps, log_every=20,
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_every=0 if not args.checkpoint_dir else 100)

    metrics = evaluate(bundle, (synthetic_batch(bundle, args.batch_size, seed=10_000 + i)
                                for i in range(4)), state)
    for task, ms in metrics.items():
        print(task, {k: round(float(v), 4) for k, v in ms.items()})


if __name__ == "__main__":
    main()
