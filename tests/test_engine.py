"""Engine unit tests: the deferred (bulk) metric drain must produce the same
meter averages as per-step fetching, and validate() must aggregate the
gathered eval matrix correctly."""

import numpy as np
import jax
import jax.numpy as jnp

from adamml_tpu.train.engine import train_epoch, validate


class _FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class _Logger:
    def __init__(self):
        self.lines = []

    def log(self, m):
        self.lines.append(m)


def test_train_epoch_deferred_drain_matches_expected_averages():
    # three fake batches with known losses/metrics
    batches = [{"x": np.full((4,), float(i)), "y": np.arange(4) % 2}
               for i in range(3)]

    def preprocess(hb):
        return jnp.asarray(hb["x"]), jnp.asarray(hb["y"])

    losses = [1.0, 2.0, 6.0]

    def step_fn(state, inputs, target, lr, rng):
        i = int(np.asarray(inputs)[0])
        return state + 1, {"loss": jnp.asarray(losses[i]),
                           "top1": jnp.asarray(50.0 + i),
                           "top5": jnp.asarray(100.0)}

    logger = _Logger()
    state, summary = train_epoch(
        _FakeLoader(batches), preprocess, step_fn, jnp.asarray(0),
        lr=0.1, adamml=False, display=2, rank=0, logger=logger, epoch=0)
    assert int(state) == 3
    np.testing.assert_allclose(summary["loss"], np.mean(losses))
    np.testing.assert_allclose(summary["top1"], np.mean([50.0, 51.0, 52.0]))
    assert summary["num_batch"] == 3
    # display drain happened at i=0 and i=2
    assert len(logger.lines) == 2


def test_validate_gathers_full_matrix():
    rng = np.random.default_rng(0)
    batches = []
    all_logits, all_targets = [], []
    for i in range(3):
        logits = rng.normal(size=(4, 5)).astype(np.float32)
        targets = rng.integers(0, 5, size=(4,))
        all_logits.append(logits)
        all_targets.append(targets)
        batches.append({"logits": logits, "y": targets})

    def preprocess(hb):
        return jnp.asarray(hb["logits"]), jnp.asarray(hb["y"])

    def eval_step(state, inputs, target, rng_):
        return inputs, jnp.asarray(0.5)

    out = validate(_FakeLoader(batches), preprocess, eval_step, None,
                   adamml=False)
    from adamml_tpu.utils.metrics import actnet_acc

    (t1, t5), mAP = actnet_acc(np.concatenate(all_logits),
                               np.concatenate(all_targets))
    np.testing.assert_allclose(out["top1"], t1)
    np.testing.assert_allclose(out["mAP"], mAP)
    np.testing.assert_allclose(out["loss"], 0.5)
    assert out["outputs"].shape == (12, 5)
