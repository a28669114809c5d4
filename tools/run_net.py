#!/usr/bin/env python3
"""CLI entry point (reference: ``tools/run_net.py:11-25`` + ``utils/parser.py:13-94``).

    python tools/run_net.py --cfg configs/Ego4D/CSTS_Ego4D_Gaze_Forecast.yaml \
        [--init-method ...] [KEY VALUE ...]

Dispatches train and/or test per TRAIN.ENABLE / TEST.ENABLE. On TPU there is no
process-spawn layer (multiprocessing.py in the reference): one jax process per host
drives all local chips; multi-host runs launch the same command per host with
``jax.distributed`` coordination via --init-method / NUM_SHARDS / SHARD_ID.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser(description="CSTS-TPU train/test runner")
    parser.add_argument("--cfg", dest="cfg_file", type=str, required=True)
    parser.add_argument(
        "--init-method", "--init_method", dest="init_method", type=str, default=None,
        help="jax.distributed coordinator address host:port (multi-host only)",
    )
    parser.add_argument("--shard-id", "--shard_id", dest="shard_id", type=int, default=0)
    parser.add_argument("--num-shards", "--num_shards", dest="num_shards", type=int, default=1)
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER,
        help="config overrides as KEY VALUE pairs",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    from csts_tpu.config import load_config

    cfg = load_config(args.cfg_file, args.opts or None)
    cfg.NUM_SHARDS = args.num_shards
    cfg.SHARD_ID = args.shard_id

    # Persistent XLA compile cache: a preemption-resume restart (or repeated
    # eval) replays the same programs — make the recompile a disk read
    # (CSTS_COMPCACHE=0 opts out; utils/compcache.py).
    from csts_tpu.utils import compcache

    compcache.enable()

    if args.num_shards > 1:
        import jax

        # NUM_SHARDS analogue: every shard joins one jax.distributed job over DCN
        jax.distributed.initialize(
            coordinator_address=args.init_method,
            num_processes=args.num_shards,
            process_id=args.shard_id,
        )

    if cfg.TRAIN.ENABLE:
        from csts_tpu.train.trainer import train

        train(cfg)
    if cfg.TEST.ENABLE:
        from csts_tpu.eval.tester import test

        test(cfg)


if __name__ == "__main__":
    main()
