"""utils/tunnel: dead-relay fail-fast (socket-level, no device contact)."""

import socket

import pytest

from hnsw_itu_tpu.utils import tunnel


def test_relay_alive_false_on_refused(monkeypatch):
    def refuse(*a, **kw):
        raise OSError("refused")

    monkeypatch.setattr(socket, "create_connection", refuse)
    assert tunnel.relay_alive() is False


def test_require_device_exits_when_axon_and_dead(monkeypatch):
    monkeypatch.setattr(tunnel, "relay_alive", lambda *a, **kw: False)
    with pytest.raises(SystemExit) as e:
        tunnel.require_device(platforms="axon,cpu")
    assert e.value.code == 2


def test_require_device_noop_on_cpu(monkeypatch):
    monkeypatch.setattr(tunnel, "relay_alive", lambda *a, **kw: False)
    tunnel.require_device(platforms="cpu")  # must not exit


def test_require_device_noop_when_alive(monkeypatch):
    monkeypatch.setattr(tunnel, "relay_alive", lambda *a, **kw: True)
    tunnel.require_device(platforms="axon,cpu")  # must not exit


def test_contact_watchdog_disarm_keeps_process():
    disarm = tunnel.contact_watchdog(seconds=0.2)
    disarm()
    import time

    time.sleep(0.4)  # were the bomb still armed, os._exit would fire here


def test_contact_watchdog_fires_without_disarm():
    import subprocess
    import sys

    code = (
        "from hnsw_itu_tpu.utils import tunnel\n"
        "import time\n"
        "tunnel.contact_watchdog(seconds=0.2)\n"
        "time.sleep(5)\n"  # simulated wedged device init
        "print('unreachable')\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=30)
    assert p.returncode == 3
    assert "wedged" in p.stderr
    assert "unreachable" not in p.stdout
