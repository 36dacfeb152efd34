"""Offline prediction-ensemble scoring (--pred_files/--pred_weights/
--after_softmax, reference opts.py:123-127 -- flags the reference defines
but never consumes; here they score saved val_*.npy artifacts)."""

import numpy as np
import pytest

from adamml_tpu.utils.ensemble import ensemble_score
from adamml_tpu.utils.metrics import actnet_acc


def _save(tmp_path, name, arr):
    p = tmp_path / name
    np.save(p, arr)
    return str(p)


class TestEnsembleScore:
    def test_single_file_matches_actnet_acc(self, tmp_path):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(20, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=(20,))
        out = ensemble_score([_save(tmp_path, "a.npy", logits)], labels)
        (t1, t5), mAP = actnet_acc(logits, labels)
        assert out["top1"] == pytest.approx(t1)
        assert out["mAP"] == pytest.approx(mAP)

    def test_weighted_sum(self, tmp_path):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(10, 4)).astype(np.float32)
        b = rng.normal(size=(10, 4)).astype(np.float32)
        labels = rng.integers(0, 4, size=(10,))
        out = ensemble_score(
            [_save(tmp_path, "a.npy", a), _save(tmp_path, "b.npy", b)],
            labels, pred_weights=[0.25, 0.75])
        np.testing.assert_allclose(out["scores"], 0.25 * a + 0.75 * b,
                                   rtol=1e-6)

    def test_after_softmax_changes_combination(self, tmp_path):
        # logits where raw-sum and prob-sum disagree on sample 0's argmax
        a = np.asarray([[10.0, 0.0, 0.0]], np.float32)   # confident class 0
        b = np.asarray([[0.0, 11.0, 0.0]], np.float32)   # MORE extreme logit
        labels = np.asarray([0])
        files = [_save(tmp_path, "a.npy", a), _save(tmp_path, "b.npy", b)]
        raw = ensemble_score(files, labels, after_softmax=False)
        soft = ensemble_score(files, labels, after_softmax=True)
        assert raw["scores"].argmax() == 1           # 11 > 10 in logit space
        # probabilities saturate: ~[.5,.5,.0] -> tie broken by tiny diffs;
        # either way, probability-space scores are bounded by 2.0
        assert soft["scores"].max() <= 2.0
        assert not np.allclose(raw["scores"], soft["scores"])

    def test_after_softmax_is_not_double_softmaxed(self, tmp_path):
        """With after_softmax the ensemble is already probabilities;
        actnet_acc must score them as-is (regression: a second row-wise
        softmax silently distorted mAP)."""
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(30, 5)).astype(np.float64) * 3.0
        labels = rng.integers(0, 5, size=(30,))
        out = ensemble_score([_save(tmp_path, "a.npy", logits)], labels,
                             after_softmax=True)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        (t1, t5), mAP = actnet_acc(probs, labels, have_softmaxed=True)
        assert out["mAP"] == pytest.approx(mAP)
        assert out["top1"] == pytest.approx(t1)

    def test_mismatched_weights_and_rows_are_loud(self, tmp_path):
        a = np.zeros((4, 3), np.float32)
        f = _save(tmp_path, "a.npy", a)
        with pytest.raises(ValueError, match="pred_weights"):
            ensemble_score([f, f], np.zeros(4, np.int64), pred_weights=[1.0])
        with pytest.raises(ValueError, match="labels"):
            ensemble_score([f], np.zeros(5, np.int64))


class TestEnsembleCLI:
    def test_pred_files_scores_saved_eval_artifacts(self, tmp_path, capsys):
        """-e writes val_*.npy; --pred_files re-scores it offline against
        the val list and reports identical top-1."""
        from tests.test_e2e import tiny_cfg
        from adamml_tpu.cli.train_adamml import run_ensemble_scoring, val_labels
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path)
        tr = AdaMMLTrainer(cfg)
        v = tr.evaluate()
        import glob
        import os

        pred = glob.glob(os.path.join(tr.log_folder, "val_*details_.npy"))
        assert pred
        cfg.runtime.pred_files = pred
        rc = run_ensemble_scoring(cfg)
        assert rc == 0
        msg = capsys.readouterr().out
        assert f"Top@1: {v['top1']:.4f}" in msg

    def test_val_labels_match_eval_order(self, tmp_path):
        from tests.test_e2e import tiny_cfg
        from adamml_tpu.cli.train_adamml import val_labels
        from adamml_tpu.train.curriculum import AdaMMLTrainer
        from adamml_tpu.utils.metrics import actnet_acc

        cfg = tiny_cfg(tmp_path)
        tr = AdaMMLTrainer(cfg)
        v = tr.evaluate()
        labels = val_labels(cfg)
        assert labels.shape[0] == v["outputs"].shape[0]
        (t1, _), _ = actnet_acc(v["outputs"], labels)
        # scoring the saved outputs against val_labels reproduces live top-1
        assert t1 == pytest.approx(v["top1"])
