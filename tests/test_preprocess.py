"""Offline preprocessing: trim windows, frame labels, wav→STFT."""

import os
import wave

import numpy as np

from csts_tpu.data import preprocess as pp


def test_ego4d_trim_windows():
    # 17 s video -> 5s windows at 0,5,10 (15-20 exceeds duration)
    wins = list(pp.ego4d_trim_windows(17.0))
    assert [(a, b) for a, b, _ in wins] == [(0, 5), (5, 10), (10, 15)]
    assert wins[1][2] == "t5_t10"
    # untracked interval [4, 6] kills windows overlapping it (preprocess.py:58-65)
    wins2 = list(pp.ego4d_trim_windows(17.0, untracked=[(4, 6)]))
    assert [(a, b) for a, b, _ in wins2] == [(10, 15)]


def test_aria_trim_windows():
    wins = list(pp.aria_trim_windows(10.0))
    # 2 s stride, 5 s length, end <= duration; names use end-1 (preprocess.py:95)
    assert [(a, b) for a, b, _ in wins] == [(0, 5), (2, 7), (4, 9)]
    assert wins[0][2] == "t0_t4"


def test_parse_untracked_csv(tmp_path):
    p = tmp_path / "untracked.csv"
    p.write_text("vid1,0:00:05,0:00:12,360\nvid1,0:01:00,0:01:30,900\nvid2,1:00:00,1:00:10,30\n")
    out = pp.parse_untracked_csv(str(p))
    assert out["vid1"] == [(5, 12), (60, 90)]
    assert out["vid2"] == [(3600, 3610)]


def test_ego4d_frame_labels():
    # gaze at 10 Hz, frames at 30 fps; type flags for saccade and off-image
    ts = np.arange(0, 1.0, 0.1)
    xy = np.stack([np.linspace(0.4, 0.6, 10), np.full(10, 0.5)], axis=1)
    xy[5] = [3.0, 0.5]  # off-image sample
    labels = pp.ego4d_frame_labels(ts, xy, num_frames=30, fps=30)
    assert labels.shape == (30, 3)
    # y flipped to image coordinates
    np.testing.assert_allclose(labels[0, 1], 0.5)
    assert labels[0, 2] == pp.GAZE_FIXATION
    # frames nearest the off-image sample are flagged trimmed
    assert (labels[:, 2] == pp.GAZE_TRIMMED).any()
    # untracked interval flagging
    labels2 = pp.ego4d_frame_labels(ts, xy, 30, 30, untracked=[(0.0, 0.2)])
    assert (labels2[:7, 2] == pp.GAZE_UNTRACKED).all()


def test_aria_frame_labels():
    ts = np.arange(0, 1.0, 0.1)
    xy_px = np.stack([np.linspace(200, 900, 10), np.linspace(200, 400, 10)], axis=1)
    labels = pp.aria_frame_labels(ts, xy_px, num_frames=20, fps=20)
    assert labels.shape == (20, 3)
    # axis swap: x_out = 1 - y/1408, y_out = x/1408 (preprocess.py:161-244)
    np.testing.assert_allclose(labels[0, 0], 1 - 200 / 1408, atol=1e-6)
    np.testing.assert_allclose(labels[0, 1], 200 / 1408, atol=1e-6)
    # fast pixel movement -> saccades flagged
    assert (labels[1:, 2] == pp.GAZE_SACCADE).any()


def test_parse_clip_window():
    assert pp.parse_clip_window("vid_t10_t15.mp4") == (10, 15)
    assert pp.parse_clip_window("movie_123_t4_t8.mp4") == (4, 9)  # Aria end-1 naming
    assert pp.parse_clip_window("noclip.mp4") is None


def test_splits_stage(tmp_path):
    """splits: clip tree -> train/test CSVs in the reference's data/*.csv format
    (relative <vid>/<clip>.mp4 paths, split by whole video, untracked clips
    dropped, lexicographically sorted) — closes C29."""
    clips = tmp_path / "clips.gaze"
    for vid, starts in (("vidA", [0, 5, 10]), ("vidB", [0, 5]), ("vidC", [0])):
        (clips / vid).mkdir(parents=True)
        for s in starts:
            (clips / vid / f"{vid}_t{s}_t{s+5}.mp4").write_bytes(b"")
    # a packed-only tree entry (pack ran, source clip deleted)
    (clips / "vidA" / "vidA_t15_t20.mp4.frames.npy").write_bytes(b"")
    # a skip-listed video must be excluded entirely
    skip_name = next(iter(pp.EGO4D_SKIP_VIDEOS))[:-4]
    (clips / skip_name).mkdir()
    (clips / skip_name / f"{skip_name}_t0_t5.mp4").write_bytes(b"")

    videos = pp.scan_clip_tree(str(clips))
    assert set(videos) == {"vidA", "vidB", "vidC", skip_name}
    assert "vidA/vidA_t15_t20.mp4" in videos["vidA"]

    untracked = {"vidA": [(4, 6)]}  # overlaps the t5_t10 (and t0_t5) windows
    train, test, ids = pp.make_splits(
        videos, test_videos={"vidB"}, untracked=untracked,
        skip_videos=pp.EGO4D_SKIP_VIDEOS,
    )
    assert ids == ["vidA", "vidB", "vidC"]  # skip-listed video excluded
    assert test == ["vidB/vidB_t0_t5.mp4", "vidB/vidB_t5_t10.mp4"]
    # untracked [4,6] kills t0_t5 and t5_t10; t10_t15 and t15_t20 survive
    assert train == ["vidA/vidA_t10_t15.mp4", "vidA/vidA_t15_t20.mp4", "vidC/vidC_t0_t5.mp4"]
    # whole-video split: no video id appears on both sides
    assert {p.split("/")[0] for p in train}.isdisjoint({p.split("/")[0] for p in test})

    # seeded fraction split is deterministic and holds out >= 1 video
    t1 = pp.make_splits(videos, test_fraction=0.34, seed=7)
    t2 = pp.make_splits(videos, test_fraction=0.34, seed=7)
    assert t1 == t2
    assert t1[1]  # non-empty test

    out = pp.write_splits(str(tmp_path / "splits"), "ego4d", train, test, ids)
    assert [os.path.basename(p) for p in out] == [
        "train_ego4d_gaze.csv", "test_ego4d_gaze.csv", "ego4d_video_ids.txt"
    ]
    lines = open(out[0]).read().splitlines()
    assert lines == train


def test_wav_roundtrip_stft(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    wav_path = str(tmp_path / "tone.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(tone.tobytes())

    npy_path = str(tmp_path / "tone.npy")
    pp.audio_stft_file(wav_path, npy_path)
    spec = np.load(npy_path)
    assert spec.shape[0] == 256
    peak_bin = np.argmax(spec.mean(axis=1))
    assert 8 <= peak_bin <= 11  # 440 Hz at 24 kHz / 511-point fft


def test_stft_stage_parallel_workers(tmp_path):
    """`preprocess stft --workers N`: the process-pool fan-out writes the same
    spectrograms as the serial path (the reference preprocesses 10k+ clips
    serially)."""
    sr = 24000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        tone = (0.3 * rng.standard_normal(sr // 2) * 32767).astype(np.int16)
        with wave.open(str(wav_dir / f"c{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(tone.tobytes())

    out_serial = tmp_path / "serial"
    out_par = tmp_path / "par"
    assert pp.main(["stft", "--input", str(wav_dir), "--output", str(out_serial)]) == 0
    assert pp.main(["stft", "--input", str(wav_dir), "--output", str(out_par),
                    "--workers", "2"]) == 0
    for i in range(3):
        a = np.load(out_serial / f"c{i}.npy")
        b = np.load(out_par / f"c{i}.npy")
        np.testing.assert_array_equal(a, b)


def test_check_stage(tmp_path):
    """`preprocess check`: a freshly built synthetic tree validates clean; each
    class of damage (missing video / audio / labels) is reported and flips the
    CLI exit code."""
    from test_end_to_end import make_aria_synthetic, make_synthetic_dataset

    from csts_tpu.data.preprocess import check_data_tree, main

    root = str(tmp_path / "ego")
    os.makedirs(root)
    prefix = make_synthetic_dataset(root)
    splits = os.path.join(root, "splits")

    report = check_data_tree(prefix, splits, "ego4d_av_gaze_forecast")
    assert report["problems"] == []
    assert report["clips"] == 8 and report["videos"] == 1  # 4 clips x 2 manifests
    assert main(["check", "--prefix", prefix, "--data-dir", splits,
                 "--dataset", "ego4d_av_gaze_forecast"]) == 0

    # damage: one clip loses its frames, another its audio, labels vanish
    os.remove(os.path.join(prefix, "vid001", "clip00_t0_t5.mp4.frames.npy"))
    os.remove(os.path.join(root, "clips.gaze.audio_stft", "vid001",
                           "clip01_t5_t10.npy"))
    os.remove(os.path.join(root, "gaze_frame_label", "vid001_frame_label.csv"))
    report = check_data_tree(prefix, splits, "ego4d_av_gaze_forecast")
    text = "\n".join(report["problems"])
    assert "no video container or packed" in text
    assert "missing audio STFT" in text
    assert "missing gaze label file" in text
    assert main(["check", "--prefix", prefix, "--data-dir", splits,
                 "--dataset", "ego4d_av_gaze_forecast"]) == 1

    # the Aria variant resolves its own audio rule + label naming
    aroot = str(tmp_path / "aria")
    os.makedirs(aroot)
    make_aria_synthetic(aroot)
    report = check_data_tree(os.path.join(aroot, "clips"),
                             os.path.join(aroot, "splits"), "aria_av_gaze_forecast")
    assert report["problems"] == []
    assert report["clips"] == 4 and report["videos"] == 1
