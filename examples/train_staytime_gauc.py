"""Example: train the staytime multi-task model (DIN sequences + 400-bin
expected-value head) and evaluate per-user GAUC with the streaming in-jit
engine — the full online-ranking loop on synthetic data.

    python examples/train_staytime_gauc.py --steps 100 --batch-size 512

Optional mixed precision (measured 1.4-2x on chip for these 32-d tables):

    python examples/train_staytime_gauc.py --bf16
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from recommendsystem_tpu.data import synthetic_batch
from recommendsystem_tpu.models import create_model
from recommendsystem_tpu.models.staytime import (StaytimeConfig, T_STAY,
                                                 T_SHORT, T_LONG)
from recommendsystem_tpu.train import fit
from recommendsystem_tpu.train.gauc_eval import evaluate_gauc_streaming
from recommendsystem_tpu.train.streaming_gauc import (StreamingGauc,
                                                      StreamingSpearmanGauc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--bucket-size", type=int, default=4096)
    ap.add_argument("--seq-max-len", type=int, default=16)
    ap.add_argument("--num-users", type=int, default=64)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 table storage + compute policy")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, force=True)
    cfg = StaytimeConfig(bucket_size=args.bucket_size,
                         seq_max_len=args.seq_max_len)
    kwargs = {}
    if args.bf16:
        kwargs = {"table_dtype": jnp.bfloat16, "compute_dtype": jnp.bfloat16}
    bundle = create_model("staytime", cfg=cfg, **kwargs)

    ds = (synthetic_batch(bundle, args.batch_size, seed=i)
          for i in range(args.steps))
    state = fit(bundle, ds, steps=args.steps, log_every=20)

    # eval with user ids carried in extras -> streaming per-user GAUC on
    # the binary heads (shortplay/longplay); state never leaves the device
    def eval_ds():
        rng = np.random.default_rng(0)
        for i in range(8):
            b, d, l, w = synthetic_batch(bundle, args.batch_size,
                                         seed=100_000 + i)
            users = rng.integers(0, args.num_users, args.batch_size)
            yield b, d, l, w, {"user_id": users}

    # mixed engines in ONE jitted pass: ROC GAUC for the binary heads,
    # spearman (inversion) GAUC for the continuous EV head — the EV output
    # spans the bin range (-19..180.5 s), the label column is wt seconds
    # clipped at 160
    gaucs = evaluate_gauc_streaming(
        bundle, eval_ds(), state, tasks=(T_STAY, T_SHORT, T_LONG),
        gauc={T_STAY: StreamingSpearmanGauc(pred_lo=-20.0, pred_hi=181.0,
                                            label_lo=0.0, label_hi=161.0),
              T_SHORT: StreamingGauc(num_buckets=4096, num_bins=256),
              T_LONG: StreamingGauc(num_buckets=4096, num_bins=256)})
    for task, g in sorted(gaucs.items()):
        kind = "spearman-inv" if task == T_STAY else "roc"
        print(f"GAUC[{task}] ({kind}) = {g:.4f}")


if __name__ == "__main__":
    main()
