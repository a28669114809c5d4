"""Config system tests: precedence chain, strict keys, coercion, finalize rules.

The reference's loader (``slowfast/utils/parser.py:67-94`` over fvcore CfgNode)
silently accepts unknown keys and carries ~15 dead config sections; this build's
typed loader rejects unknown keys and *warns* on the known-legacy sections.
These tests pin that contract plus the shared behavior: defaults <- YAML <- CLI
``KEY VALUE`` precedence, reference-style value coercion (tuple strings, bools),
the NUM_GPUS alias, and the ``assert_and_infer_cfg`` derivations
(``defaults.py:945-970``: LR x NUM_SHARDS scaling, batch/axis divisibility).
"""

import glob
import os

import pytest
import yaml

from csts_tpu.config.config import (
    get_cfg,
    load_config,
    merge_from_dict,
    merge_from_list,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shipped_yamls_load(tmp_path):
    paths = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yaml")))
    assert len(paths) == 4, f"expected the 4 shipped run configs, found {paths}"
    for p in paths:
        cfg = load_config(p, output_dir=str(tmp_path / os.path.basename(p)))
        # Recipe facts shared by all four shipped configs.
        assert cfg.MVIT.EMBED_DIM > 0 and cfg.MVIT.DEPTH == 16
        assert cfg.TRAIN.DATASET == cfg.TEST.DATASET
        assert cfg.SOLVER.OPTIMIZING_METHOD == "adamw"
        # dump() must be a plain-JSON-able dict (it rides in checkpoint sidecars).
        d = cfg.dump()
        assert d["MVIT"]["EMBED_DIM"] == cfg.MVIT.EMBED_DIM


def test_precedence_defaults_yaml_cli(tmp_path):
    cfg_file = tmp_path / "t.yaml"
    cfg_file.write_text(yaml.safe_dump({"TRAIN": {"BATCH_SIZE": 4}, "RNG_SEED": 7}))
    cfg = load_config(str(cfg_file), opts=["TRAIN.BATCH_SIZE", "2"], output_dir=str(tmp_path))
    assert cfg.TRAIN.BATCH_SIZE == 2  # CLI beats YAML
    assert cfg.RNG_SEED == 7  # YAML beats defaults
    assert cfg.NUM_SHARDS == 1  # untouched default


def test_unknown_keys_rejected():
    with pytest.raises(KeyError, match="Unknown config key"):
        merge_from_dict(get_cfg(), {"TRAIN": {"NO_SUCH_KEY": 1}})
    with pytest.raises(KeyError, match="Unknown config"):
        merge_from_list(get_cfg(), ["TRAIN.NO_SUCH_KEY", "1"])
    with pytest.raises(KeyError, match="Unknown config"):
        merge_from_list(get_cfg(), ["NOSECTION.X", "1"])


def test_legacy_sections_warn_and_drop():
    cfg = get_cfg()
    with pytest.warns(UserWarning, match="legacy PySlowFast config section"):
        merge_from_dict(cfg, {"RESNET": {"DEPTH": 50}, "TRAIN": {"BATCH_SIZE": 4}})
    assert cfg.TRAIN.BATCH_SIZE == 4  # the live key still merged
    assert not hasattr(cfg, "RESNET")


def test_coercion_and_alias():
    cfg = get_cfg()
    # Reference YAMLs write tuples as strings; CLI values arrive as strings.
    merge_from_list(
        cfg,
        [
            "DATA.TRAIN_CROP_SIZE", "64",
            "TRAIN.ENABLE", "False",
            "NUM_GPUS", "4",  # reference alias for NUM_DEVICES
        ],
    )
    assert cfg.DATA.TRAIN_CROP_SIZE == 64 and isinstance(cfg.DATA.TRAIN_CROP_SIZE, int)
    assert cfg.TRAIN.ENABLE is False
    assert cfg.NUM_DEVICES == 4
    # A fractional value for an int field must not silently truncate.
    with pytest.raises(TypeError, match="expected int"):
        merge_from_list(get_cfg(), ["TRAIN.BATCH_SIZE", "2.5"])


def test_finalize_lr_scaling_and_divisibility():
    cfg = get_cfg()
    base = cfg.SOLVER.BASE_LR
    cfg.NUM_SHARDS = 4
    cfg.SOLVER.BASE_LR_SCALE_NUM_SHARDS = True
    cfg.finalize()
    assert cfg.SOLVER.BASE_LR == pytest.approx(base * 4)

    bad = get_cfg()
    bad.NUM_DEVICES = 8
    bad.PARALLEL.MODEL = 2  # data axis = 4
    bad.TRAIN.BATCH_SIZE = 6  # not divisible by 4
    with pytest.raises(AssertionError, match="must divide"):
        bad.finalize()


def test_config_dump_cli(tmp_path):
    """python -m csts_tpu.config: defaults as YAML, --diff shows only overrides,
    and the dumped YAML round-trips through load_config."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-m", "csts_tpu.config"],
                       cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    dumped = yaml.safe_load(r.stdout)
    assert dumped["MVIT"]["DEPTH"] == 16 and "PARALLEL" in dumped
    # round-trip: the printed YAML is itself a loadable config
    p = tmp_path / "defaults.yaml"
    p.write_text(r.stdout)
    cfg = load_config(str(p), output_dir=str(tmp_path))
    assert cfg.MVIT.DEPTH == 16

    shipped = os.path.join(REPO, "configs", "Ego4D", "CSTS_Ego4D_Gaze_Forecast.yaml")
    r = subprocess.run([sys.executable, "-m", "csts_tpu.config", "--diff",
                        "--cfg", shipped, "TRAIN.BATCH_SIZE", "16"],
                       cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    diff = yaml.safe_load(r.stdout)
    assert diff["TRAIN"]["BATCH_SIZE"] == 16  # CLI override visible
    assert "DEPTH" not in diff.get("MVIT", {})  # default-equal keys dropped

    # finalize-derived values (BASE_LR x NUM_SHARDS) are NOT reported as overrides
    r = subprocess.run([sys.executable, "-m", "csts_tpu.config", "--diff",
                        "NUM_SHARDS", "4", "SOLVER.BASE_LR_SCALE_NUM_SHARDS", "True"],
                       cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    diff = yaml.safe_load(r.stdout)
    assert diff["NUM_SHARDS"] == 4 and diff["SOLVER"]["BASE_LR_SCALE_NUM_SHARDS"] is True
    assert "BASE_LR" not in diff["SOLVER"]  # derived, not user-written
