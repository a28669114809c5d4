"""Caffe2 legacy checkpoint converter parity (reference: c2_model_loading.py +
checkpoint.py:220-288). The name cascade is asserted against the reference's own
``get_name_convert_func`` imported in place, so every regex pair is oracle-checked
rather than hand-derived."""

import pickle
import sys

import numpy as np

from csts_tpu.convert.from_caffe2 import (
    c2_key_to_sub_bn,
    convert_c2_name,
    convert_caffe2_checkpoint,
)

# representative blob names covering every rule family: stem, slow/fast res
# blocks, BN params/stats, lateral fusion, non-local, head, SE, momentum scratch
C2_NAMES = [
    "conv1_w",
    "conv1_xy_w",
    "res_conv1_bn_s",
    "res_conv1_bn_b",
    "res_conv1_bn_rm",
    "res_conv1_bn_riv",
    "res2_0_branch1_w",
    "res2_0_branch1_bn_s",
    "res4_4_branch2c_w",
    "res4_4_branch2c_bn_b",
    "res4_4_branch2c_bn_rm",
    "res5_2_branch2a_bn_riv",
    "t_conv1_w",
    "t_res_conv1_bn_s",
    "t_res4_1_branch2b_w",
    "t_res4_1_branch2b_bn_rm",
    "t_pool1_subsample_w",
    "t_pool1_subsample_bn_s",
    "t_res4_5_branch2c_bn_subsample_w",
    "t_res4_5_branch2c_bn_subsample_bn_rm",
    "nonlocal_conv3_1_theta_w",
    "nonlocal_conv3_1_g_w",
    "nonlocal_conv3_1_phi_b",
    "nonlocal_conv3_1_out_w",
    "nonlocal_conv4_2_bn_s",
    "nonlocal_conv4_2_bn_rm",
    "pred_w",
    "pred_b",
    "conv_5_w",
    "lin_5_b",
    "res5_0_b_bn_fc_w",
    "conv1_w_momentum",
]


def _reference_convert_func():
    from reference_oracle import install_stubs

    install_stubs()
    sys.path.insert(0, "/root/reference")
    try:
        from slowfast.utils.c2_model_loading import get_name_convert_func
    finally:
        sys.path.pop(0)
    return get_name_convert_func()


def test_name_cascade_matches_reference_oracle():
    ref = _reference_convert_func()
    for name in C2_NAMES:
        assert convert_c2_name(name) == ref(name), name


def test_sub_bn_redirect():
    model_keys = {
        "s1.pathway0_stem.bn.split_bn.running_mean",
        "s1.pathway0_stem.bn.weight",
    }
    assert (
        c2_key_to_sub_bn("s1.pathway0_stem.bn.running_mean", model_keys)
        == "s1.pathway0_stem.bn.split_bn.running_mean"
    )
    # non-stat keys and already-present keys pass through
    assert c2_key_to_sub_bn("s1.pathway0_stem.bn.weight", model_keys) == (
        "s1.pathway0_stem.bn.weight"
    )
    present = {"s1.pathway0_stem.bn.running_mean"}
    assert c2_key_to_sub_bn("s1.pathway0_stem.bn.running_mean", present) == (
        "s1.pathway0_stem.bn.running_mean"
    )


def test_convert_checkpoint_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    blobs = {
        # conv weight, exact shape match
        "res2_0_branch1_w": rng.standard_normal((8, 4, 1, 1, 1)).astype(np.float32),
        # linear -> conv: trailing-1 expansion (checkpoint.py:233-241)
        "pred_w": rng.standard_normal((10, 8)).astype(np.float32),
        # BN stat tiled 2x onto a Sub-BN split stat (checkpoint.py:243-252)
        "res_conv1_bn_rm": rng.standard_normal((4,)).astype(np.float32),
        # shape mismatch -> dropped like the reference's non-strict load
        "res_conv1_bn_s": rng.standard_normal((3,)).astype(np.float32),
        # optimizer scratch -> skipped
        "conv1_w_momentum": rng.standard_normal((2,)).astype(np.float32),
    }
    path = tmp_path / "c2.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    model_shapes = {
        "s2.pathway0_res0.branch1.weight": (8, 4, 1, 1, 1),
        "head.projection.weight": (10, 8, 1, 1, 1),
        "s1.pathway0_stem.bn.split_bn.running_mean": (8,),
        "s1.pathway0_stem.bn.weight": (4,),
    }
    sd = convert_caffe2_checkpoint(str(path), model_shapes)

    assert set(sd) == {
        "s2.pathway0_res0.branch1.weight",
        "head.projection.weight",
        "s1.pathway0_stem.bn.split_bn.running_mean",
    }
    np.testing.assert_array_equal(
        sd["s2.pathway0_res0.branch1.weight"], blobs["res2_0_branch1_w"]
    )
    np.testing.assert_array_equal(
        sd["head.projection.weight"],
        blobs["pred_w"].reshape(10, 8, 1, 1, 1),
    )
    np.testing.assert_array_equal(
        sd["s1.pathway0_stem.bn.split_bn.running_mean"],
        np.concatenate([blobs["res_conv1_bn_rm"]] * 2),
    )

    # no-filter mode returns every non-scratch blob under its converted name
    raw = convert_caffe2_checkpoint(str(path), None)
    assert "conv1_w_momentum" not in " ".join(raw)
    assert len(raw) == 4
