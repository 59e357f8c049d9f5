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
    # Serialize on ONE xdist worker: pyproject's `-n auto --dist
    # loadgroup` speeds up the CPU suite, but THIS directory drives the
    # one attached TPU chip — concurrent workers would contend for it
    # through the axon tunnel. A shared xdist_group pins every item
    # here to a single worker under --dist loadgroup.
    tpu_serial = pytest.mark.xdist_group("tpu-serial")
    for item in items:
        item.add_marker(tpu_serial)
    _skip_on_cpu(items)


def _skip_on_cpu(items):
    import jax

    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="no TPU attached (cpu backend)")
        for item in items:
            item.add_marker(skip)
