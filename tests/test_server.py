"""Live TCP integration — the reference integ suite's socket workflow
against our server (spawn, connect, exact byte responses, concurrency)."""

import socket
import threading

import pytest

from hlld_spark.server import HlldServer


@pytest.fixture()
def server(tmp_path):
    srv = HlldServer(str(tmp_path / "data"), port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _connect(srv):
    s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
    return s, s.makefile("r")


def test_tcp_lifecycle(server):
    s, fh = _connect(server)
    s.sendall(b"list\n")
    assert fh.readline() == "START\n"
    assert fh.readline() == "END\n"
    s.sendall(b"create foobar\n")
    assert fh.readline() == "Done\n"
    s.sendall(b"create foobar\n")
    assert fh.readline() == "Exists\n"
    s.sendall(b"bulk foobar a b c\n")
    assert fh.readline() == "Done\n"
    s.sendall(b"info foobar\n")
    lines = [fh.readline() for _ in range(10)]
    assert lines[0] == "START\n" and lines[-1] == "END\n"
    assert "size 3\n" in lines
    s.sendall(b"drop foobar\n")
    assert fh.readline() == "Done\n"
    s.close()


def test_tcp_pipelined(server):
    """The reference's bench pipelines many commands on one connection."""
    s, fh = _connect(server)
    s.sendall(b"create p\n")
    assert fh.readline() == "Done\n"
    n = 500
    payload = b"".join(b"set p key%d\n" % i for i in range(n))
    s.sendall(payload)
    for _ in range(n):
        assert fh.readline() == "Done\n"
    s.sendall(b"info p\n")
    block = [fh.readline() for _ in range(10)]
    assert any(line.startswith("size 5") for line in block)  # ~500 at p12
    s.close()


def test_tcp_concurrent_clients(server):
    """set-vs-set races from several clients (integ test shape)."""
    server.command_handler.handle_command("create c\n")
    errors = []

    def client(tag):
        try:
            s, fh = _connect(server)
            for i in range(200):
                s.sendall(f"set c {tag}-{i}\n".encode())
                if fh.readline() != "Done\n":
                    errors.append(tag)
                    return
            s.close()
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(t,)) for t in range(4)]
    [t.start() for t in threads]
    [t.join(timeout=60) for t in threads]
    assert not errors
    info = server.registry.info("c")
    assert info["sets"] == 800
    assert abs(info["size"] - 800) / 800 < 0.05


def test_tcp_bad_command(server):
    s, fh = _connect(server)
    s.sendall(b"frobnicate\n")
    assert fh.readline() == "Client Error: Command not supported\n"
    s.sendall(b"set nope k\n")
    assert fh.readline() == "Set does not exist\n"
    s.close()
