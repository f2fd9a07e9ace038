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


def contact_watchdog(seconds: float | None = None, exit_code: int = 3):
    """Arm a watchdog for FIRST device contact; returns a disarm() callable.

    A second relay failure mode (observed 2026-08-20, after the outright
    port-closed death relay_alive() covers): the relay still ACCEPTS TCP
    but the backend behind it is wedged, and jax hangs forever inside C++
    device init — uninterruptible by Python signal handlers. The only
    reliable escape is a daemon thread that ``os._exit``\\ s the process if
    the caller doesn't disarm within ``seconds`` (cold first contact
    measured up to ~180 s; the default leaves >2x headroom). An explicit
    ``seconds`` argument wins; the HNSW_TPU_CONTACT_TIMEOUT env var only
    replaces the 420 s default. Usage::

        disarm = contact_watchdog()
        np.asarray(jnp.zeros(8) + 1)   # first device contact
        disarm()
    """
    import os
    import threading

    if seconds is None:
        seconds = float(os.environ.get("HNSW_TPU_CONTACT_TIMEOUT", 420.0))
    done = threading.Event()

    def _bomb():
        if not done.wait(seconds):
            print(
                f"ERROR: first device contact did not complete within "
                f"{seconds:.0f}s — the relay accepted TCP but the backend "
                f"is wedged; exiting instead of hanging forever.",
                file=sys.stderr,
                flush=True,
            )
            os._exit(exit_code)

    threading.Thread(target=_bomb, daemon=True).start()
    return done.set
