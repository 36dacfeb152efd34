import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from adamml_tpu.parallel.mesh import (batch_spec, make_mesh, param_shardings,
                                      replicate, shard_batch)


def test_make_mesh_shapes():
    mesh = make_mesh(-1, 1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(4, 2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8, 1)
    batch = {"x": np.zeros((16, 3, 4), np.float32),
             "y": np.zeros((16,), np.int32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == P("data", None, None)
    assert out["y"].sharding.spec == P("data")


def test_param_shardings_tp_rules():
    mesh = make_mesh(4, 2)
    tree = {
        "joint_fc1": {"kernel": jnp.zeros((2560, 2048)),
                      "bias": jnp.zeros((2048,))},
        "fc": {"kernel": jnp.zeros((512, 5))},        # 5 % 2 != 0 -> replicate
        "conv": {"kernel": jnp.zeros((3, 3, 64, 64))},
    }
    sh = param_shardings(mesh, tree)
    assert sh["joint_fc1"]["kernel"].spec == P(None, "model")
    assert sh["joint_fc1"]["bias"].spec == P()
    assert sh["fc"]["kernel"].spec == P()
    assert sh["conv"]["kernel"].spec == P()


def test_replicate_and_global_reduction():
    """A mean over a data-sharded batch under jit is a GLOBAL mean -- the
    sync-BN / metric-allreduce semantic (SURVEY.md section 5.8)."""
    mesh = make_mesh(8, 1)
    x = np.arange(32, dtype=np.float32).reshape(32, 1)
    xs = shard_batch(x, mesh)

    @jax.jit
    def f(v):
        return jnp.mean(v)

    assert float(f(xs)) == float(x.mean())


def test_replicated_params_grad_allreduce():
    """Replicated params + sharded batch: grads come back replicated
    (XLA inserts the psum), matching DDP's gradient all-reduce."""
    mesh = make_mesh(8, 1)
    w = replicate({"w": jnp.ones((4, 1))}, mesh)
    x = shard_batch(np.random.default_rng(0).normal(size=(16, 4)).astype(
        np.float32), mesh)

    @jax.jit
    def loss(params, x):
        return jnp.mean((x @ params["w"]) ** 2)

    g = jax.jit(jax.grad(loss))(w, x)
    assert g["w"].sharding.is_fully_replicated
