"""RandAugment / RandomErasing behaviour tests."""

import numpy as np

from csts_tpu.data.rand_augment import (
    parse_policy,
    rand_augment_clip,
    random_erasing_clip,
)


def test_parse_policy():
    assert parse_policy("rand-m9-n2-mstd0.5") == (2, 9.0, 0.5)
    assert parse_policy("rand-m7-n4-mstd0.5-inc1") == (4, 7.0, 0.5)


def test_rand_augment_temporal_consistency(rng):
    # identical frames must stay identical after augmentation (same ops per frame)
    frame = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    clip = np.stack([frame] * 4)
    out = rand_augment_clip(clip, "rand-m9-n3-mstd0.5", np.random.default_rng(0))
    assert out.shape == clip.shape
    for t in range(1, 4):
        np.testing.assert_array_equal(out[0], out[t])


def test_rand_augment_seeded_reproducible(rng):
    clip = rng.integers(0, 255, (2, 24, 24, 3), dtype=np.uint8)
    a = rand_augment_clip(clip, "rand-m9-n2-mstd0.5", np.random.default_rng(3))
    b = rand_augment_clip(clip, "rand-m9-n2-mstd0.5", np.random.default_rng(3))
    c = rand_augment_clip(clip, "rand-m9-n2-mstd0.5", np.random.default_rng(4))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_random_erasing(rng):
    clip = np.zeros((4, 32, 32, 3), np.float32)
    out = random_erasing_clip(clip, np.random.default_rng(0), prob=1.1)
    # same region erased in every frame
    changed = np.any(out != 0, axis=-1)
    for t in range(1, 4):
        np.testing.assert_array_equal(changed[0], changed[t])
    assert changed.any()
    # prob 0 -> no-op
    out2 = random_erasing_clip(clip, np.random.default_rng(0), prob=0.0)
    np.testing.assert_array_equal(out2, clip)
