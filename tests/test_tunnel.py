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
