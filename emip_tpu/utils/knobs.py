"""One-time logging of resolved kernel-selection knobs.

Several hot paths pick between XLA and Pallas implementations at trace time
(backend + env-var dependent). So a run's kernel selection is recorded and
reproducible, every resolution is logged once per (name, value) through the
``emip_tpu`` logger.
"""

from __future__ import annotations

import logging
import os

_logged: set[tuple[str, str]] = set()


def resolve(name: str, value, env: str | None = None):
    """Resolve a knob: env-var override (if set) wins, then ``value``.

    Logs the resolved choice once per distinct (name, value).
    """
    if env is not None and env in os.environ:
        raw = os.environ[env]
        value = type(value)(raw) if value is not None else raw
        source = f"env {env}"
    else:
        source = "config"
    key = (name, repr(value))
    if key not in _logged:
        _logged.add(key)
        logging.getLogger("emip_tpu").info(
            "knob %s = %r (%s)", name, value, source
        )
    return value
