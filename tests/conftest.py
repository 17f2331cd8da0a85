"""Test harness config: CPU backend, 8 virtual devices, float64 enabled.

Something on this image's pytest import chain already imports jax before
conftest runs, so plain env vars are too late; jax.config updates still work
as long as no backend has been initialized. The session env pre-sets
JAX_PLATFORMS=axon (TPU tunnel) — slow per-dispatch and float64-free — so
tests force the CPU backend and validate numerics against the numpy float64
oracle at tight tolerance (the reference C++ is all double). Multi-chip
sharding logic is exercised on 8 virtual CPU devices (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: reruns skip the XLA:CPU LLVM backend entirely
# (the suite compiles >100 programs; beyond speed, live LLVM compiles late in
# a long-lived process have been observed to segfault — cache hits avoid them).
jax.config.update("jax_compilation_cache_dir", "/root/.jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def run_example(script: str, *args: str, timeout: int = 900):
    """Run an examples/ CLI driver in a fresh subprocess on the CPU backend.

    Example drivers are real entry points; exercising them via subprocess
    tests the CLI surface itself and isolates their (large) XLA compilations
    from the test process — the XLA:CPU compiler has been observed to
    segfault on big programs compiled late in a long-lived session.
    Returns the completed process; asserts rc == 0 with the output attached.
    """
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=repo, env=env,
    )
    assert proc.returncode == 0, (
        f"{script} rc={proc.returncode}\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}"
    )
    return proc
