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


class TestCapacityDropAccounting:
    def test_validate_counts_dropped_selections(self):
        """validate() must report how many selected segment-rows exceed the
        eval_capacity packing budget, per modality (models/joint_net.py
        zeroes them silently inside the jit)."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        from adamml_tpu.train.engine import validate

        # one batch of 4 samples x 2 segments x 2 modalities; modality 0
        # selects 6 of 8 rows, modality 1 selects 2 of 8
        dec = np.zeros((4, 2, 2), np.float32)
        dec[:3, :, 0] = 1.0   # 6 selected
        dec[0, :, 1] = 1.0    # 2 selected
        logits = np.tile(np.arange(5, dtype=np.float32), (4, 1))
        target = np.arange(4) % 5

        def eval_step(state, inputs, tgt, rng):
            return (jnp.asarray(logits), jnp.asarray(dec),
                    jnp.asarray(1.0))

        loader = [dict(x=0)]
        out = validate(loader, lambda b: ([jnp.zeros((4,))],
                                          jnp.asarray(target)),
                       eval_step, state=None, modality=["rgb", "sound"],
                       adamml=True, num_segments=2, eval_capacity=0.5)
        # cap = 0.5 * 8 rows = 4: rgb drops 6-4=2, sound drops 0
        assert out["capacity_dropped"] == {"rgb": 2, "sound": 0}

    def test_no_drop_report_without_capacity(self):
        import numpy as np
        import jax.numpy as jnp

        from adamml_tpu.train.engine import validate

        def eval_step(state, inputs, tgt, rng):
            return (jnp.zeros((2, 5)), jnp.zeros((2, 2, 1)),
                    jnp.asarray(1.0))

        out = validate([dict()], lambda b: ([jnp.zeros((2,))],
                                            jnp.asarray([0, 1])),
                       eval_step, state=None, modality=["rgb"], adamml=True,
                       num_segments=2, eval_capacity=None)
        assert "capacity_dropped" not in out
