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

from csts_tpu.config.config import (
    get_cfg,
    load_config,
    merge_from_dict,
    merge_from_list,
)


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
                    help="print only keys that differ from the code defaults "
                         "(pre-finalize: values finalize() derives, like "
                         "BASE_LR x NUM_SHARDS, are not reported as overrides)")
    args = ap.parse_args(argv)

    if args.diff:
        # Diff the PRE-finalize merge: finalize() derives values the user never
        # wrote (BASE_LR x NUM_SHARDS etc.) and would report them as overrides.
        cfg = get_cfg()
        if args.cfg:
            with open(args.cfg) as f:
                merge_from_dict(cfg, yaml.safe_load(f) or {})
        if args.opts:
            merge_from_list(cfg, args.opts)
        effective = _diff(_to_plain(get_cfg().dump()), _to_plain(cfg.dump()))
    elif args.cfg or args.opts:
        effective = _to_plain(load_config(args.cfg, opts=args.opts or None,
                                          output_dir=".").dump())
    else:
        effective = _to_plain(get_cfg().dump())
    yaml.safe_dump(effective, sys.stdout, default_flow_style=None, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
