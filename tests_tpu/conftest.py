"""On-device (TPU) test harness — the Mosaic-compiled kernel gate.

tests/ force CPU (8 virtual devices) so the suite runs anywhere; this
directory runs the REAL compiled kernels on the attached chip and is the
regression gate round-2's verdict demanded: interpret-mode coverage
cannot catch a Mosaic miscompile or a paging race.

Run: `python -m pytest tests_tpu/ -q`   (skips itself entirely on CPU)

One TPU job at a time (see .claude/skills/verify/SKILL.md); compiles go
through the axon tunnel, so budget ~30 s per first-use kernel variant.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="no TPU attached (cpu backend)")
        for item in items:
            item.add_marker(skip)
