#!/usr/bin/env python3
"""Input-pipeline-only throughput benchmark (reference: slowfast/utils/benchmark.py).

    python tools/benchmark_loader.py --cfg configs/... [--batches 20] [KEY VALUE ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from csts_tpu.config import load_config
    from csts_tpu.utils.logging import setup_logging
    from csts_tpu.utils.misc import benchmark_data_loading

    cfg = load_config(args.cfg, args.opts or None)
    setup_logging(cfg.OUTPUT_DIR)
    stats = benchmark_data_loading(cfg, args.batches)
    print(stats)


if __name__ == "__main__":
    main()
