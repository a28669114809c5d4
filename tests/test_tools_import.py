"""Import-smoke every CLI/measurement tool under tools/.

The on-chip tools (ab_*, bench_*, certify_kernels, profile_forward, ...) only
ever run manually against the real chip, so a refactor that breaks one of their
imports is otherwise invisible until the next hardware session — a staleness
class that has bitten before (a kernel certificate went unrefreshed for exactly
this reason, round-3 verdict). Importing each module under the CPU test
platform catches syntax errors, renamed symbols, and moved modules for free;
it executes no device work because every tool keeps its logic behind
``if __name__ == "__main__"``.
"""

import glob
import importlib.util
import os
import sys

import pytest

TOOLS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")

# validate_tpu.py is a script-style tool that does its work at import time
# (builds a synthetic dataset and drives the real eval pipeline) — run it on
# hardware, not here.
EXCLUDE = {"validate_tpu.py"}

TOOL_FILES = sorted(
    p for p in glob.glob(os.path.join(TOOLS_DIR, "*.py"))
    if os.path.basename(p) not in EXCLUDE
)


@pytest.mark.parametrize("path", TOOL_FILES, ids=[os.path.basename(p) for p in TOOL_FILES])
def test_tool_imports(path):
    name = "toolsmoke_" + os.path.basename(path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(name, None)
