"""One-time generator for the 256² golden-parity fixture (VERDICT round-1 item 3).

Runs the PyTorch reference CSTS (loaded in place from /root/reference via the test
oracle shims — no code copied) at the SHIPPED configuration: 256² video crop,
256² audio STFT, 8 frames, batch 1, fp32, eval mode. At this shape the reference's
hard-coded (1, 8, 8) fusion pools (custom_multimodal_builder.py:227-229) are native —
no rebuild needed, unlike the reduced-crop parity tests.

Saves tests/fixtures/golden_256.npz containing ONLY the small artifacts:
  - logits          (1, 1, 8, 64, 64) fp32 reference output
  - v_embed/a_embed (1, 768)          contrastive embeddings (return_embed=True)
  - input seeds + model seed           so the test can reconstruct everything

The model weights are NOT stored: the test re-instantiates the reference with the
same torch seed (init only — cheap), converts via csts_tpu.convert, and asserts our
256² forward against these logits. That makes the committed fixture ~200 KB while
still certifying the benchmarked shape end to end.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

MODEL_SEED = 7
INPUT_SEED = 123
CROP = 256
FRAMES = 8


def main():
    import torch

    from reference_oracle import load_reference_csts

    torch.set_num_threads(os.cpu_count() or 1)
    model, _ = load_reference_csts(crop_size=CROP, num_frames=FRAMES, seed=MODEL_SEED)

    rng = np.random.default_rng(INPUT_SEED)
    video = rng.standard_normal((1, 3, FRAMES, CROP, CROP), dtype=np.float32)
    audio = rng.standard_normal((1, 1, FRAMES, CROP, CROP), dtype=np.float32)

    t0 = time.time()
    with torch.no_grad():
        logits, v_emb, a_emb = model(
            [torch.from_numpy(video)], torch.from_numpy(audio), return_embed=True
        )
    print(f"oracle forward: {time.time() - t0:.1f}s", file=sys.stderr)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures", "golden_256.npz"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        logits=logits.numpy(),
        v_embed=v_emb.numpy(),
        a_embed=a_emb.numpy(),
        model_seed=np.int64(MODEL_SEED),
        input_seed=np.int64(INPUT_SEED),
        crop=np.int64(CROP),
        frames=np.int64(FRAMES),
    )
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
