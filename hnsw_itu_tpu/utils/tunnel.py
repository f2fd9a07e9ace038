"""Remote-TPU tunnel health probe.

The axon backend reaches the chip through a local relay
(127.0.0.1:8113). The relay can die outright (all ports closed), and
jax then HANGS FOREVER at first device contact instead of raising —
a multi-hour benchmark can burn its data-generation phase and then
block indefinitely. Probe before committing to the backend.
"""

from __future__ import annotations

import socket
import sys

_RELAY = ("127.0.0.1", 8113)


def relay_alive(timeout: float = 3.0) -> bool:
    try:
        with socket.create_connection(_RELAY, timeout=timeout):
            return True
    except OSError:
        return False


def require_device(exit_code: int = 2, platforms: str | None = None) -> None:
    """Exit fast when the configured platform needs the relay and the
    relay is down. Reads the jax *config* (the env var JAX_PLATFORMS is
    ignored by this environment's sitecustomize — only
    jax.config.update("jax_platforms", ...) pins a platform).
    ``platforms`` overrides the config read (tests)."""
    if platforms is None:
        import jax

        platforms = jax.config.jax_platforms or "axon"
    if "axon" not in platforms:
        return
    if platforms.split(",")[0] == "cpu":
        return  # cpu is the preferred backend; no device contact needed
    if not relay_alive():
        print(
            "ERROR: TPU tunnel relay (127.0.0.1:8113) is down — refusing "
            "to hang at device init. Pin the CPU backend with "
            "jax.config.update('jax_platforms', 'cpu') to run without it.",
            file=sys.stderr,
        )
        sys.exit(exit_code)
