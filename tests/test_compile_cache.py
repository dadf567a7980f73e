"""GEA_COMPILE_CACHE: the persistent XLA compilation cache must populate
on first use and be hit by a fresh process (the production workflow runs
train/sample/eval as separate processes over the same programs; each
remote TPU compile costs 20-40s, so cross-process reuse is the point)."""

import os
import subprocess
import sys

PROG = """
import jax, jax.numpy as jnp
import gea  # applies GEA_COMPILE_CACHE before any backend use
x = jnp.ones((64, 64))
print(float(jax.jit(lambda a: (a @ a).sum())(x)))
"""


def run_prog(cache_dir):
    env = dict(os.environ)
    env.update(
        GEA_PLATFORM="cpu",
        GEA_COMPILE_CACHE=cache_dir,
        GEA_COMPILE_CACHE_MIN_SECS="0",
    )
    out = subprocess.run(
        [sys.executable, "-c", PROG],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    return out


def test_cache_populates_and_survives_processes(tmp_path):
    cache = str(tmp_path / "cc")
    run_prog(cache)
    entries = os.listdir(cache)
    assert entries, "first process wrote no cache entries"
    mtimes = {e: os.path.getmtime(os.path.join(cache, e)) for e in entries}
    run_prog(cache)
    # Second process reused the entries instead of rewriting them.
    entries2 = os.listdir(cache)
    assert set(entries2) >= set(entries)
    for e, t in mtimes.items():
        assert os.path.getmtime(os.path.join(cache, e)) == t


def test_no_env_no_cache_config():
    env = dict(os.environ)
    env.pop("GEA_COMPILE_CACHE", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # ambient dev/CI setting
    env["GEA_PLATFORM"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import gea, jax; print(repr(jax.config.jax_compilation_cache_dir))",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() in ("None", "''"), out.stdout
