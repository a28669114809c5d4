"""Print the effective configuration as YAML.

    python -m csts_tpu.config                          # all defaults, every knob
    python -m csts_tpu.config --cfg run.yaml K V ...   # a run's effective config
    python -m csts_tpu.config --diff --cfg run.yaml    # only keys that differ from defaults

The reference's CfgNode prints itself at train start but has no standalone
view; here the typed dataclass schema (``config.py``) IS the documentation,
and this entry point renders it — useful for authoring YAMLs (what knobs
exist, with defaults) and for debugging a run's override chain (``--diff``).
"""

import argparse
import json
import sys

import yaml

from csts_tpu.config.config import get_cfg, load_config


def _to_plain(d):
    return json.loads(json.dumps(d))  # tuples -> lists, yaml-safe


def _diff(default: dict, effective: dict, path=""):
    out = {}
    for k, v in effective.items():
        dv = default.get(k)
        if isinstance(v, dict) and isinstance(dv, dict):
            sub = _diff(dv, v, f"{path}.{k}")
            if sub:
                out[k] = sub
        elif v != dv:
            out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cfg", default=None, help="YAML run config to merge over defaults")
    ap.add_argument("opts", nargs="*", help="KEY VALUE override pairs (run_net.py syntax)")
    ap.add_argument("--diff", action="store_true",
                    help="print only keys that differ from the code defaults")
    args = ap.parse_args(argv)

    if args.cfg or args.opts:
        cfg = load_config(args.cfg, opts=args.opts or None, output_dir=".")
    else:
        cfg = get_cfg()
    effective = _to_plain(cfg.dump())
    if args.diff:
        effective = _diff(_to_plain(get_cfg().dump()), effective)
    yaml.safe_dump(effective, sys.stdout, default_flow_style=None, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
