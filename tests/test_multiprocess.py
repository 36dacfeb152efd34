"""REAL multi-process distributed test: two jax processes, one global mesh.

The reference exercises its hostfile/NCCL path only in production
(SURVEY.md section 2.2); here two local processes join via
jax.distributed.initialize over 4 forced CPU devices each (8 global), run
the unimodal trainer for one epoch, and validate -- exercising
process-spanning mesh construction, per-process data sharding, grad psum
across processes, and the process_allgather eval path (reference
utils/utils.py:483-490, concat_all_gather :539-550).

Heavy (two cold XLA:CPU compiles on this 1-core box share a compile
cache), so it runs one tiny config only.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

from adamml_tpu.configs.config import ExperimentConfig
from adamml_tpu.train.curriculum import UnimodalTrainer

cfg = ExperimentConfig()
cfg.model.backbone_net = "resnet"
cfg.model.depth = 18
cfg.model.groups = 2
cfg.model.modality = ["rgb"]
cfg.model.num_classes = 4
cfg.model.compute_dtype = "float32"
cfg.optim.batch_size = 8
cfg.optim.epochs = 1
cfg.optim.lr_scheduler = "multisteps"
cfg.data.dataset = "synthetic"
# 13 is NOT divisible by processes x batch: shard equalization pads to 14
# (7/process), and each process's 2nd val batch carries 3 padded rows --
# the masked ragged-tail path must still produce exact global metrics
cfg.data.synthetic_length = 13
cfg.data.input_size = 16
cfg.data.canvas_size = (32, 48)
cfg.data.scale_range = [20, 24]
cfg.data.workers = 1
cfg.runtime.logdir = sys.argv[3]  # SHARED by all processes, as in production
trainer = UnimodalTrainer(cfg)
assert trainer.train_loader.num_shards == 2
assert trainer.train_loader.shard_index == pid
result = trainer.run()
# every process must see the SAME globally-gathered eval numbers
print("RESULT", json.dumps({"pid": pid, "top1": result["top1"],
                            "mAP": result["mAP"], "loss": result["loss"],
                            "val_rows": int(result["outputs"].shape[0])}),
      flush=True)
"""


@pytest.mark.slow
def test_two_process_mesh_train_and_gathered_eval(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid),
             str(tmp_path / "logs")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    import json

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    # gathered eval: both processes computed metrics over the FULL val set
    assert results[0]["top1"] == pytest.approx(results[1]["top1"])
    assert results[0]["mAP"] == pytest.approx(results[1]["mAP"])
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-5)
    # padded rows were dropped: exactly the 13 real samples remain
    assert results[0]["val_rows"] == results[1]["val_rows"] == 13
