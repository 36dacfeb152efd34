"""Multi-crop oversample eval (reference GroupOverSample,
utils/video_transforms.py:121-178; --num_crops {1,3,5,10}, opts.py:120)."""

import numpy as np
import pytest

from adamml_tpu.data.aug_params import (OVERSAMPLE_CENTER,
                                        oversample_crop_flip)


class TestOversampleRects:
    def test_five_crop_matches_reference_offsets(self):
        # image 256x340, input 224: short side already 256 = scale target,
        # so source coords == scaled coords. fill_fix_offset steps:
        # w_step = (340-224)//4 = 29, h_step = (256-224)//4 = 8
        hw = np.asarray([[256, 340]])
        crops, flips = oversample_crop_flip(hw, input_size=224, num_crops=5)
        assert crops.shape == (1, 5, 4) and flips.shape == (1, 5)
        expected = [(0, 0), (116, 0), (0, 32), (116, 32), (58, 16)]
        for j, (ox, oy) in enumerate(expected):
            np.testing.assert_allclose(crops[0, j], [ox, oy, 224, 224],
                                       atol=1e-5)
        assert not flips.any()

    def test_ten_crop_interleaves_flips(self):
        hw = np.asarray([[256, 340]])
        crops, flips = oversample_crop_flip(hw, input_size=224, num_crops=10)
        assert crops.shape == (1, 10, 4)
        # [c0, c0_flip, c1, c1_flip, ...] per reference extend order
        assert flips[0].tolist() == [False, True] * 5
        np.testing.assert_allclose(crops[0, 0], crops[0, 1])
        # center-unflipped index points at the center offset (58, 16)
        c = OVERSAMPLE_CENTER[10]
        assert not flips[0, c]
        np.testing.assert_allclose(crops[0, c], [58, 16, 224, 224], atol=1e-5)

    def test_three_crop_landscape_and_portrait(self):
        crops_l, _ = oversample_crop_flip(np.asarray([[256, 340]]),
                                          input_size=224, num_crops=3)
        # landscape: left / right / center -> distinct x, same y
        assert len({round(float(x)) for x in crops_l[0, :, 0]}) == 3
        assert len({round(float(y)) for y in crops_l[0, :, 1]}) == 1
        crops_p, _ = oversample_crop_flip(np.asarray([[340, 256]]),
                                          input_size=224, num_crops=3)
        # portrait: top / bottom / center -> distinct y, same x
        assert len({round(float(y)) for y in crops_p[0, :, 1]}) == 3
        assert len({round(float(x)) for x in crops_p[0, :, 0]}) == 1

    def test_scaling_maps_back_to_source(self):
        # 512x680 is exactly 2x of 256x340: source rectangles double
        big, _ = oversample_crop_flip(np.asarray([[512, 680]]),
                                      input_size=224, num_crops=5)
        small, _ = oversample_crop_flip(np.asarray([[256, 340]]),
                                        input_size=224, num_crops=5)
        np.testing.assert_allclose(big, small * 2.0, atol=0.5)

    def test_invalid_count_rejected(self):
        with pytest.raises(ValueError, match="num_crops"):
            oversample_crop_flip(np.asarray([[256, 340]]), input_size=224,
                                 num_crops=4)


@pytest.mark.slow  # several full eval compiles (test tiers: README)
class TestOversampleEndToEnd:
    def test_adamml_eval_three_crops(self, tmp_path):
        """--num_crops 3 runs e2e: crops fold into the device batch, logits
        average over crops, artifacts keep (N_val, S, M) decision shape."""
        from tests.test_e2e import tiny_cfg
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path, data__num_crops=3)
        tr = AdaMMLTrainer(cfg)
        assert tr.val_loader.num_crops == 3
        v = tr.evaluate()
        n_val = cfg.data.synthetic_length
        assert v["outputs"].shape == (n_val, cfg.model.num_classes)
        assert v["all_selections"].shape[0] == n_val
        # the artifact filename's {num_crops}crops tag is now earned
        import glob
        import os

        assert glob.glob(os.path.join(tr.log_folder, "val_3crops_*.npy"))

    def test_sound_only_unimodal_crops_fold(self, tmp_path):
        """Sound has no spatial crops, but --num_crops must still fold the
        batch so the eval step's per-crop reshape stays aligned (regression:
        the crop count is config-driven, not inferred from crop rects, which
        a sound-only batch does not carry). Metrics equal --num_crops 1."""
        from tests.test_e2e import tiny_cfg
        from adamml_tpu.train.curriculum import UnimodalTrainer

        import jax

        from adamml_tpu.train.engine import validate

        cfg1 = tiny_cfg(tmp_path / "a", modality=("sound",))
        cfg1.model.backbone_net = "sound_mobilenet_v2"
        cfg3 = tiny_cfg(tmp_path / "b", modality=("sound",),
                        data__num_crops=3)
        cfg3.model.backbone_net = "sound_mobilenet_v2"
        t1, t3 = UnimodalTrainer(cfg1), UnimodalTrainer(cfg3)
        rng = jax.random.PRNGKey(0)
        v1 = validate(t1.val_loader, t1.val_pre, t1.eval_step, t1.state,
                      rng=rng, adamml=False)
        v3 = validate(t3.val_loader, t3.val_pre, t3.eval_step, t3.state,
                      rng=rng, adamml=False)
        assert v1["outputs"].shape == v3["outputs"].shape
        # replicated rows average to the single-crop logits exactly
        np.testing.assert_allclose(v1["outputs"], v3["outputs"],
                                   rtol=1e-5, atol=1e-5)

    def test_crop_average_differs_from_single_crop(self, tmp_path):
        """3-crop logits are a real average: they differ from 1-crop logits
        for the same weights/data."""
        from tests.test_e2e import tiny_cfg
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg1 = tiny_cfg(tmp_path / "a")
        cfg3 = tiny_cfg(tmp_path / "b", data__num_crops=3)
        t1, t3 = AdaMMLTrainer(cfg1), AdaMMLTrainer(cfg3)
        v1, v3 = t1._validate(), t3._validate()
        assert v1["outputs"].shape == v3["outputs"].shape
        assert not np.allclose(v1["outputs"], v3["outputs"])
