#!/usr/bin/env python3
"""End-to-end FED pipeline benchmark: disk -> decode -> device preprocess ->
train step, on a generated real JPEG/WAV tree (VERDICT round-1 item 8).

The headline bench (bench.py) times the jitted step on device-resident
synthetic inputs; this tool measures what a user actually gets when the
host pipeline feeds the chip: clips/s INCLUDING host time, plus the
data_time/batch_time split the reference logs (reference
utils/utils.py:212,248).

Usage: python tools/bench_pipeline.py [videos=16] [batch=8] [steps=12]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

FRAMES = 64
H, W = 256, 340  # extract_rgb.py short-side-256 shape


def generate_tree(root: str, videos: int) -> None:
    from PIL import Image
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    rgb_root = os.path.join(root, "rgb")
    sound_root = os.path.join(root, "sound")
    os.makedirs(rgb_root, exist_ok=True)
    os.makedirs(sound_root, exist_ok=True)
    lines = []
    t0 = time.time()
    base = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    for v in range(videos):
        vdir = os.path.join(rgb_root, f"vid_{v}")
        os.makedirs(vdir, exist_ok=True)
        for i in range(1, FRAMES + 1):
            # cheap but JPEG-realistic: shifted noise image per frame
            arr = np.roll(base, shift=v * 31 + i * 7, axis=1)
            Image.fromarray(arr).save(os.path.join(vdir, f"{i:05d}.jpg"),
                                      quality=85)
        sig = (rng.normal(size=int(24000 * FRAMES / 29.97)) * 5000).astype(
            np.int16)
        wavfile.write(os.path.join(sound_root, f"vid_{v}.wav"), 24000, sig)
        lines.append(f"vid_{v};1;{FRAMES};{v % 5}")
    with open(os.path.join(rgb_root, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(sound_root, "train.txt"), "w") as f:
        f.write("\n".join(l.replace(";", ".wav;", 1) for l in lines) + "\n")
    print(f"# generated {videos} videos x {FRAMES} frames in "
          f"{time.time() - t0:.1f}s", flush=True)


def bench_decode_threads(videos: int = 4) -> int:
    """Native-decoder thread-scaling table (--threads): decodes the same
    JPEG set with n_threads 1/2/4/8 via decode_jpeg_batch, substantiating
    the host-core scaling claim in BENCH.md (the loader's across-sample
    thread pool composes with this within-sample knob; both are GIL-free)."""
    from adamml_tpu.data.native_decode import decode_jpeg_batch, native_available

    if not native_available():
        print("native decoder unavailable; build adamml_tpu/native first")
        return 1
    root = os.environ.get("BENCH_PIPELINE_DIR")
    if not root:
        root = tempfile.mkdtemp(prefix="adamml_pipe_")
    if not os.path.isdir(os.path.join(root, "rgb")):
        generate_tree(root, videos)
    paths = []
    for v in range(videos):
        vdir = os.path.join(root, "rgb", f"vid_{v}")
        paths += [os.path.join(vdir, f"{i:05d}.jpg")
                  for i in range(1, FRAMES + 1)]
    canvas = np.zeros((len(paths), H, 464, 3), np.uint8)
    decode_jpeg_batch(paths[:8], canvas[:8], n_threads=1)  # warm cache
    print(f"# {len(paths)} JPEGs ({H}x{W}), {os.cpu_count()} host cores")
    base = None
    for nt in (1, 2, 4, 8):
        t0 = time.perf_counter()
        decode_jpeg_batch(paths, canvas, n_threads=nt)
        dt = time.perf_counter() - t0
        base = base or dt
        print(f"n_threads={nt}: {dt * 1e3:7.1f} ms total  "
              f"{dt / len(paths) * 1e3:5.2f} ms/img  "
              f"speedup x{base / dt:.2f}", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--threads":
        return bench_decode_threads(int(sys.argv[2]) if len(sys.argv) > 2
                                    else 4)
    videos = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from adamml_tpu.data.dataflow import HostDataLoader
    from adamml_tpu.data.device_pipeline import make_batch_preprocessor
    from adamml_tpu.data.video_dataset import MultiVideoDataset
    from adamml_tpu.models.model_builder import build_model, init_model
    from adamml_tpu.train.optim import build_optimizer
    from adamml_tpu.train.steps import make_adamml_train_step
    from adamml_tpu.train.train_state import AdaMMLTrainState, StageFlags

    root = os.environ.get("BENCH_PIPELINE_DIR")
    if not root:
        root = tempfile.mkdtemp(prefix="adamml_pipe_")
    if not os.path.isdir(os.path.join(root, "rgb")):
        generate_tree(root, videos)

    cfg = _flagship_cfg()
    cfg.optim.batch_size = batch
    dataset = MultiVideoDataset(
        [os.path.join(root, "rgb"), os.path.join(root, "sound")],
        "train.txt", ["rgb", "sound"], num_groups=cfg.model.groups,
        frames_per_group=cfg.model.frames_per_group,
        num_clips=cfg.model.num_segments, dense_sampling=True,
        is_train=True, separator=";", num_classes=31,
        canvas_size=(256, 464), audio_length=cfg.data.audio_length,
        resampling_rate=cfg.data.resampling_rate, fps=29.97)
    workers = max(2, (os.cpu_count() or 1))
    loader = HostDataLoader(dataset, batch, is_train=True, input_size=224,
                            workers=workers, seed=0, prefetch=3)
    pre = make_batch_preprocessor(cfg, train=True,
                                  num_segments=cfg.model.num_segments)

    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    host_batch = next(iter(loader))
    inputs, target = pre(host_batch)
    variables = init_model(model, cfg, inputs, rng, train=True)
    params = dict(variables["params"])
    tx_main = build_optimizer("main", cfg.optim)
    tx_policy = build_optimizer("policy", cfg.optim)
    state = AdaMMLTrainState.create(
        params, variables.get("batch_stats", {}),
        tx_main.init(params["main_net"]), tx_policy.init(params["policy_net"]))
    step = make_adamml_train_step(
        model, tx_main, tx_policy, flags=StageFlags.policy_phase(),
        penalty_type="blockdrop", gammas=10.0, clip_gradient=None,
        has_policy_params=True)
    lr = jnp.asarray(1e-3)
    cw = jnp.asarray([1.0, 0.05])

    # compile
    state, metrics = step(state, inputs, target, lr, lr, cw, rng)
    float(jax.device_get(metrics["loss"]))

    data_t, step_t, n_clips, m = [], [], 0, None
    t_epoch = time.perf_counter()
    end = time.perf_counter()
    it = iter(loader)
    for i in range(steps):
        try:
            host_batch = next(it)
        except StopIteration:
            loader.set_epoch(i)
            it = iter(loader)
            host_batch = next(it)
        t1 = time.perf_counter()
        data_t.append(t1 - end)
        inputs, target = pre(host_batch)
        state, m = step(state, inputs, target, lr, lr, cw,
                        jax.random.fold_in(rng, i))
        n_clips += int(target.shape[0])
        end = time.perf_counter()
        step_t.append(end - t1)
    float(jax.device_get(m["loss"]))  # drain
    total = time.perf_counter() - t_epoch

    print(f"# fed-pipeline: {n_clips / total:.1f} clips/s end-to-end "
          f"(batch {batch}, {workers} host threads)")
    print(f"# data_time {np.mean(data_t) * 1000:.1f} ms/batch, "
          f"step+dispatch {np.mean(step_t) * 1000:.1f} ms/batch, "
          f"overlap ratio {np.mean(data_t) / max(np.mean(step_t), 1e-9):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
