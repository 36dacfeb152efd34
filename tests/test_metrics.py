import numpy as np
import pytest

from adamml_tpu.utils.metrics import accuracy, actnet_acc, mean_average_precision
from adamml_tpu.utils.meters import AverageMeter


def test_topk_accuracy():
    logits = np.array([
        [0.1, 0.9, 0.0, 0.0],   # pred 1, target 1 -> top1 hit
        [0.8, 0.1, 0.05, 0.05], # pred 0, target 2 -> top1 miss, top3 ?
        [0.2, 0.3, 0.4, 0.1],   # pred 2, target 2 -> hit
        [0.4, 0.3, 0.2, 0.1],   # pred 0, target 3 -> miss top1, miss top2
    ])
    target = np.array([1, 2, 2, 3])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert top1 == pytest.approx(50.0)
    # top2 preds: [1,0],[0,1],[2,1],[0,1] -> hits rows 0,2 -> 50%
    assert top2 == pytest.approx(50.0)


def test_map_perfect_and_worst():
    probs = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]])
    gt = np.array([[1, 0], [1, 0], [0, 1]], dtype=float)
    assert mean_average_precision(probs, gt) == pytest.approx(1.0)
    gt_bad = np.array([[0, 1], [0, 1], [1, 0]], dtype=float)
    # class0: scores .9,.8,.1, positive is the lowest -> AP = 1/3
    # class1: scores .1,.2,.9, positives are the two lowest ->
    #   ranked scores desc: .9(neg), .2(pos), .1(pos) -> AP = (1/2 + 2/3)/2
    expected = np.mean([1.0 / 3.0, (0.5 + 2.0 / 3.0) / 2.0])
    assert mean_average_precision(probs, gt_bad) == pytest.approx(expected)


def test_actnet_acc_single_label():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64, 10))
    labels = rng.integers(0, 10, size=(64,))
    acc, ap = actnet_acc(logits, labels)
    assert len(acc) == 2
    assert 0.0 <= acc[0] <= 100.0
    assert 0.0 <= ap <= 100.0
    # perfect logits -> 100 / 100
    perfect = np.eye(10)[labels] * 10.0
    acc, ap = actnet_acc(perfect, labels)
    assert acc[0] == pytest.approx(100.0)
    assert ap == pytest.approx(100.0)


def test_actnet_acc_multilabel():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 5))
    gt = (rng.random((16, 5)) > 0.5).astype(float)
    acc, ap = actnet_acc(logits, gt)
    assert acc == [0.0, 0.0]
    assert 0.0 <= ap <= 100.0


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.val == 4.0
    assert m.sum == pytest.approx(6.0)
    assert m.avg == pytest.approx(2.0)
