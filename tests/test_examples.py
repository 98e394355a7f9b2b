"""Example recipes run green as scripts (the reference ships runnable
examples/; these are the Python counterparts — each one executes as a
subprocess the way a user would run it)."""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")

# Light, self-contained recipes (the dev server has its own test;
# 05/06/09 spawn pools / device paths / sockets and stay out of the
# default suite's budget).
SCRIPTS = [
    "01_buffer_basics.py",
    "02_streaming.py",
    "03_dictionary.py",
    "04_raw_blocks.py",
    "08_file_cache_base64.py",
    "10_file_blob_stream.py",
    "11_edge_handler.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        capture_output=True, text=True, timeout=300, env=env)
    assert res.returncode == 0, (script, res.stdout[-2000:],
                                 res.stderr[-2000:])
