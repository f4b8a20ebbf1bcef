"""Central hypothesis budget knob (VERDICT r8 #2: suite ≤ 20 min).

Two modes:

- **fast** (default): DERANDOMIZED (fixed example set — reproducible,
  no run-to-run search variance) with capped example counts. This is
  what CI/the driver runs; the cap values were chosen so every property
  suite keeps exercising each grammar branch at least once (the
  strategies are branch-heavy, not depth-heavy).
- **thorough**: the pre-round-9 randomized search with the original
  (or larger) example counts — the nightly-style escape hatch. Run with
  ``IMX_HYPOTHESIS=thorough python -m pytest tests/ ...``.

Every property file builds its settings through :func:`n_examples` /
:data:`DERANDOMIZE` so the knob stays in one place.
"""

from __future__ import annotations

import os

THOROUGH = os.environ.get("IMX_HYPOTHESIS", "fast") == "thorough"

#: fast mode pins the example set; thorough keeps the random search
DERANDOMIZE = not THOROUGH


def n_examples(fast: int, thorough: int) -> int:
    """Example count for the active mode."""
    return thorough if THOROUGH else fast
