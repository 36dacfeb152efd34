"""Smoke tests for the offline extraction tools (reference
tools/extract_rgb.py, tools/extract_audio.py) with a stubbed ffmpeg/ffprobe
on PATH: command construction, scaling rule, and output layout."""

import json
import os
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Stub ffmpeg/ffprobe: log argv as JSON lines; ffprobe answers a fixed
# size; ffmpeg touches its output target so layout is observable.
_FFPROBE = """#!{py}
import json, os, sys
with open(os.environ["TOOL_LOG"], "a") as f:
    f.write(json.dumps(["ffprobe"] + sys.argv[1:]) + "\\n")
print("{w},{h}")
"""

_FFMPEG = """#!{py}
import json, os, sys
with open(os.environ["TOOL_LOG"], "a") as f:
    f.write(json.dumps(["ffmpeg"] + sys.argv[1:]) + "\\n")
out = sys.argv[-1]
os.makedirs(os.path.dirname(out), exist_ok=True)
tgt = out.replace("%05d", "00001")
open(tgt, "wb").write(b"x")
"""


@pytest.fixture
def fake_ffmpeg(tmp_path):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "calls.jsonl"
    log.write_text("")

    def write(name, body):
        p = bindir / name
        p.write_text(body)
        p.chmod(p.stat().st_mode | stat.S_IEXEC)

    def make(w=340, h=256):
        write("ffprobe", _FFPROBE.format(py=sys.executable, w=w, h=h))
        write("ffmpeg", _FFMPEG.format(py=sys.executable))
        env = dict(os.environ)
        env["PATH"] = f"{bindir}:{env['PATH']}"
        env["TOOL_LOG"] = str(log)
        env["PYTHONPATH"] = REPO
        return env, log

    return make


def _run(tool, args, env):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), *args],
        env=env, capture_output=True, text=True, timeout=120)


def _setup_inputs(tmp_path, names):
    root = tmp_path / "videos"
    root.mkdir()
    for n in names:
        (root / n).write_bytes(b"fake")
    lst = tmp_path / "list.txt"
    lst.write_text("".join(n + "\n" for n in names))
    return lst, root


class TestExtractRGB:
    def test_landscape_scale_and_layout(self, tmp_path, fake_ffmpeg):
        env, log = fake_ffmpeg(w=340, h=256)
        lst, root = _setup_inputs(tmp_path, ["a.mp4", "b.mkv"])
        out = tmp_path / "frames"
        r = _run("extract_rgb.py", [str(lst), str(root), str(out)], env)
        assert r.returncode == 0, r.stdout + r.stderr
        assert r.stdout.count("OK") == 2
        calls = [json.loads(x) for x in log.read_text().splitlines()]
        ff = [c for c in calls if c[0] == "ffmpeg"]
        assert len(ff) == 2
        for c in ff:
            # landscape (w>=h): scale height to 256, keep aspect
            assert "scale=-2:256" in c
            assert "-q:v" in c and c[c.index("-q:v") + 1] == "2"
        # per-video directory with the {:05d}.jpg template
        assert (out / "a" / "00001.jpg").exists()
        assert (out / "b" / "00001.jpg").exists()

    def test_portrait_scales_width(self, tmp_path, fake_ffmpeg):
        env, log = fake_ffmpeg(w=240, h=426)
        lst, root = _setup_inputs(tmp_path, ["p.mp4"])
        r = _run("extract_rgb.py",
                 [str(lst), str(root), str(tmp_path / "o")], env)
        assert r.returncode == 0
        calls = [json.loads(x) for x in log.read_text().splitlines()]
        ff = [c for c in calls if c[0] == "ffmpeg"][0]
        assert "scale=256:-2" in ff

    def test_probe_failure_skips(self, tmp_path, fake_ffmpeg):
        env, log = fake_ffmpeg()
        # break ffprobe: nonzero exit
        (tmp_path / "bin" / "ffprobe").write_text(
            f"#!{sys.executable}\nimport sys; sys.exit(1)\n")
        lst, root = _setup_inputs(tmp_path, ["bad.mp4"])
        r = _run("extract_rgb.py",
                 [str(lst), str(root), str(tmp_path / "o")], env)
        assert r.returncode == 0
        assert "SKIP" in r.stdout


class TestExtractAudio:
    def test_wav_command_and_layout(self, tmp_path, fake_ffmpeg):
        env, log = fake_ffmpeg()
        lst, root = _setup_inputs(tmp_path, ["a.mp4"])
        out = tmp_path / "wav"
        r = _run("extract_audio.py", [str(lst), str(root), str(out)], env)
        assert r.returncode == 0, r.stdout + r.stderr
        assert "OK" in r.stdout
        calls = [json.loads(x) for x in log.read_text().splitlines()]
        ff = [c for c in calls if c[0] == "ffmpeg"][0]
        # mono 24 kHz pcm_s16le (reference tools/extract_audio.py:8-15)
        for flag, val in (("-acodec", "pcm_s16le"), ("-ac", "1"),
                          ("-ar", "24000")):
            assert ff[ff.index(flag) + 1] == val
        assert (out / "a.wav").exists()

    def test_usage_message(self, tmp_path, fake_ffmpeg):
        env, _ = fake_ffmpeg()
        r = _run("extract_audio.py", [], env)
        assert r.returncode == 1
        assert "Usage" in r.stdout


class TestDecodeThreadsKnob:
    def test_decode_threads_plumbs_to_dataset(self, tmp_path):
        """--decode_threads reaches the native decode call site
        (video_dataset.py)."""
        from adamml_tpu.configs.config import arg_parser, config_from_args

        parser = arg_parser()
        args = parser.parse_args(["--decode_threads", "4"])
        cfg = config_from_args(args)
        assert cfg.data.decode_threads == 4
