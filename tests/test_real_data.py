"""Dataset tests over a real on-disk frame/wav tree (generated in tmp),
covering JPEG decode (native + PIL paths), flow pairs, rgbdiff consecutive
loading, audio windows, and the MultiVideoDataset shared-index invariant."""

import os

import numpy as np
import pytest
from PIL import Image
from scipy.io import wavfile

from adamml_tpu.data.video_dataset import MultiVideoDataset, VideoDataset


NUM_FRAMES = 30
H, W = 64, 80


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ks")
    rgb_root = root / "rgb"
    flow_root = root / "flow"
    sound_root = root / "sound"
    for d in (rgb_root, flow_root, sound_root):
        d.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for v in range(3):
        name = f"vid_{v}"
        (rgb_root / name).mkdir()
        (flow_root / name).mkdir()
        for i in range(1, NUM_FRAMES + 1):
            arr = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(arr).save(rgb_root / name / f"{i:05d}.jpg",
                                      quality=95)
            gx = rng.integers(0, 255, (H, W), dtype=np.uint8)
            gy = rng.integers(0, 255, (H, W), dtype=np.uint8)
            Image.fromarray(gx, "L").save(flow_root / name / f"x_{i:05d}.jpg")
            Image.fromarray(gy, "L").save(flow_root / name / f"y_{i:05d}.jpg")
        if v < 2:  # vid_2 has no wav -> zero-spectrogram fallback
            sig = (rng.normal(size=24000) * 5000).astype(np.int16)
            wavfile.write(str(sound_root / f"{name}.wav"), 24000, sig)
        lines.append(f"{name};1;{NUM_FRAMES};{v % 2}")
    for d in (rgb_root, flow_root, sound_root):
        (d / "train.txt").write_text("\n".join(lines) + "\n")
    # sound list points at wav files
    (sound_root / "train.txt").write_text(
        "\n".join(f"vid_{v}.wav;1;{NUM_FRAMES};{v % 2}" for v in range(3))
        + "\n")
    return root


def _mk(root, modality, **kw):
    args = dict(num_groups=4, frames_per_group=1, num_clips=2,
                dense_sampling=True, is_train=True, separator=";",
                num_classes=2, canvas_size=(H, 96), audio_length=0.5,
                resampling_rate=24000, fps=29.97)
    args.update(kw)
    return VideoDataset(str(root), "train.txt", modality=modality, **args)


class TestRealTree:
    def test_rgb_native_and_pil_agree(self, data_root):
        from adamml_tpu.data.native_decode import native_available

        ds_native = _mk(data_root / "rgb", "rgb", use_native_decoder=True)
        ds_pil = _mk(data_root / "rgb", "rgb", use_native_decoder=False)
        rec = ds_native.video_list[0]
        idx = np.asarray([1, 5, 9, 13, 2, 6, 10, 14])
        a = ds_native.get_data(rec, idx)
        b = ds_pil.get_data(rec, idx)
        np.testing.assert_array_equal(a["hw"], [H, W])
        np.testing.assert_array_equal(b["hw"], [H, W])
        if native_available():
            # decoders may differ by +-1 LSB in IDCT rounding
            diff = np.abs(a["frames"].astype(int) - b["frames"].astype(int))
            assert diff.max() <= 1
        assert a["frames"].shape == (8, H, 96, 3)
        assert a["frames"][:, :, W:].max() == 0  # canvas padding stays zero

    def test_flow_pairs(self, data_root):
        ds = _mk(data_root / "flow", "flow")
        rec = ds.video_list[0]
        idx = np.asarray([1, 6])
        out = ds.get_data(rec, idx)
        # 2 positions x 5 consecutive = 10 canvas frames, 2 channels
        assert out["frames"].shape == (10, H, 96, 2)
        # x/y channels differ (independent random images)
        assert (out["frames"][..., 0] != out["frames"][..., 1]).any()

    def test_rgbdiff_consecutive(self, data_root):
        ds = _mk(data_root / "rgb", "rgbdiff")
        rec = ds.video_list[0]
        assert rec.end_frame == NUM_FRAMES - 1  # last frame dropped
        out = ds.get_data(rec, np.asarray([1]))
        assert out["frames"].shape == (6, H, 96, 3)  # 5 diffs need 6 frames

    def test_sound_window_and_missing(self, data_root):
        ds = _mk(data_root / "sound", "sound")
        rec0 = ds.video_list[0]
        out = ds.get_data(rec0, np.asarray([1, 5, 9, 13, 2, 6, 10, 14]))
        assert out["wave"].shape == (2, 12000)
        assert out["valid"].tolist() == [1.0, 1.0]
        rec2 = ds.video_list[2]  # missing wav
        out2 = ds.get_data(rec2, np.asarray([1, 5, 9, 13, 2, 6, 10, 14]))
        assert out2["valid"].tolist() == [0.0, 0.0]
        np.testing.assert_allclose(out2["wave"], 0.0)

    def test_multi_dataset_shared_indices(self, data_root):
        ds = MultiVideoDataset(
            [str(data_root / "rgb"), str(data_root / "sound")], "train.txt",
            ["rgb", "sound"], num_groups=4, frames_per_group=1, num_clips=2,
            dense_sampling=True, is_train=True, separator=";", num_classes=2,
            canvas_size=(H, 96), audio_length=0.5, resampling_rate=24000)
        payload, label = ds[0]
        assert set(payload) == {"rgb", "sound"}
        assert payload["rgb"]["frames"].shape == (8, H, 96, 3)
        assert payload["sound"]["wave"].shape == (2, 12000)
        assert label in (0, 1)

    def test_getitem_end_to_end(self, data_root):
        ds = _mk(data_root / "rgb", "rgb")
        payload, label = ds[1]
        assert payload["frames"].shape == (8, H, 96, 3)
        assert label == 1
