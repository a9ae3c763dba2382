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


# --- round 2: UDP bind, background flush/cold threads, integ races -----------


def test_udp_bind_and_reference_stub_parity(server):
    """The reference binds UDP (networking.c:228-266) but its datagram
    handler warns and drops (networking.c:389-393). Default mode mirrors
    that: datagrams are received and counted, never executed."""
    assert server.udp_port == server.port + 1 or server.udp_port > 0
    u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    u.sendto(b"create udpset\n", ("127.0.0.1", server.udp_port))
    import time

    deadline = time.time() + 5
    while server.udp_datagrams == 0 and time.time() < deadline:
        time.sleep(0.02)
    assert server.udp_datagrams >= 1
    # not executed: the set must NOT exist
    s, fh = _connect(server)
    s.sendall(b"info udpset\n")
    assert fh.readline() == "Set does not exist\n"
    s.close()
    u.close()


def test_udp_fire_and_forget_extension(tmp_path):
    """udp_process=True executes set/bulk datagrams without a response
    (documented extension beyond the reference's stub)."""
    import time

    srv = HlldServer(str(tmp_path / "d"), port=0, udp_process=True)
    srv.start_background()
    try:
        srv.command_handler.handle_command("create u\n")
        u = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(50):
            u.sendto(b"bulk u k%d x%d\n" % (i, i), ("127.0.0.1", srv.udp_port))
        deadline = time.time() + 10
        while time.time() < deadline:
            with srv.registry_lock:
                if srv.registry.info("u")["sets"] >= 100:
                    break
            time.sleep(0.05)
        with srv.registry_lock:
            assert srv.registry.info("u")["sets"] == 100
        u.close()
    finally:
        srv.shutdown()


def test_background_flush_thread(tmp_path):
    """src/background.c:99-146: a long-lived server persists dirty sets
    on the flush cadence without any client flush command."""
    import os
    import time

    srv = HlldServer(str(tmp_path / "d"), port=0, udp_port=-1, flush_interval=0.3)
    srv.start_background()
    try:
        s, fh = _connect(srv)
        s.sendall(b"create bg\n")
        assert fh.readline() == "Done\n"
        s.sendall(b"bulk bg a b c d e\n")
        assert fh.readline() == "Done\n"
        data = os.path.join(str(tmp_path / "d"), "hlld.bg", "registers.mmap")
        deadline = time.time() + 10
        while not os.path.exists(data) and time.time() < deadline:
            time.sleep(0.05)
        assert os.path.exists(data), "flush thread never persisted the dirty set"
        assert srv.flush_count >= 1
        s.close()
    finally:
        srv.shutdown()


def test_background_cold_sweep_thread(tmp_path):
    """src/background.c:152-194: sets untouched for two sweeps are paged
    out (registers=None, page_outs bumped); touching re-faults them."""
    import time

    srv = HlldServer(str(tmp_path / "d"), port=0, udp_port=-1, cold_interval=0.2)
    srv.start_background()
    try:
        srv.command_handler.handle_command("create cold1\n")
        srv.command_handler.handle_command("bulk cold1 a b c\n")
        deadline = time.time() + 10
        while time.time() < deadline:
            with srv.registry_lock:
                if srv.registry._sets["cold1"].registers is None:
                    break
            time.sleep(0.05)
        with srv.registry_lock:
            assert srv.registry._sets["cold1"].registers is None, "cold set never unmapped"
            assert srv.registry._sets["cold1"].page_outs >= 1
        # access faults it back in and the data survived
        assert "size 3" in srv.command_handler.handle_command("info cold1\n")
    finally:
        srv.shutdown()


def test_concurrent_drop_race(server):
    """integ test_concurrent_drop (test_integ.py:226-251): sets racing a
    drop either succeed or see 'Set does not exist' — never corrupt."""
    import time

    s, fh = _connect(server)
    s.sendall(b"create pingpong\n")
    assert fh.readline() == "Done\n"

    def drop():
        time.sleep(0.1)
        s2, fh2 = _connect(server)
        s2.sendall(b"drop pingpong\n")
        fh2.readline()
        s2.close()

    t = threading.Thread(target=drop)
    t.start()
    saw_missing = False
    for x in range(5000):
        s.sendall(b"set pingpong test%d\n" % x)
        resp = fh.readline()
        if resp != "Done\n":
            assert resp == "Set does not exist\n" and x > 0
            saw_missing = True
            break
    t.join()
    assert saw_missing, "drop never interleaved with the set loop"
    s.close()


def test_concurrent_close_race(server):
    """integ test_concurrent_close (test_integ.py:252-270): closing while
    setting is transparent — every set still returns Done (auto
    fault-in)."""
    import time

    s, fh = _connect(server)
    s.sendall(b"create pingpong\n")
    assert fh.readline() == "Done\n"
    closed = threading.Event()

    def close():
        time.sleep(0.05)
        s2, fh2 = _connect(server)
        for _ in range(3):
            s2.sendall(b"close pingpong\n")
            assert fh2.readline() == "Done\n"
            time.sleep(0.02)
        s2.close()
        closed.set()

    t = threading.Thread(target=close)
    t.start()
    for x in range(3000):
        s.sendall(b"set pingpong test%d\n" % x)
        assert fh.readline() == "Done\n"
        if closed.is_set() and x > 2000:
            break
    t.join()
    info = server.registry.info("pingpong")
    assert info["page_outs"] >= 1 and info["page_ins"] >= 1
    s.close()


def test_concurrent_create_race(server):
    """integ test_concurrent_create (test_integ.py:295-320): creates on a
    second connection while the first sets into other sets."""
    s, fh = _connect(server)
    s.sendall(b"create pingpong\n")
    assert fh.readline() == "Done\n"

    def create():
        s2, fh2 = _connect(server)
        for x in range(10):
            s2.sendall(b"create pingpong%d\n" % x)
            assert fh2.readline() in ("Done\n", "Exists\n")
        s2.close()

    t = threading.Thread(target=create)
    t.start()
    for x in range(500):
        s.sendall(b"set pingpong test%d\n" % x)
        assert fh.readline() == "Done\n"
    for r in range(3):
        for x in range(300):
            s.sendall(b"set pingpong%d test%d\n" % (r, x))
            resp = fh.readline()
            assert resp in ("Done\n", "Set does not exist\n")
    t.join()
    s.close()


def test_create_drop_create_in_progress(server):
    """integ test_in_progress_drop (test_integ.py:352-377): create after
    drop returns Done (vacuum synchronous here) or Delete in progress
    when vacuum is deferred."""
    s, fh = _connect(server)
    for _ in range(5):
        s.sendall(b"create dip\n")
        assert fh.readline() == "Done\n"
        s.sendall(b"drop dip\n")
        assert fh.readline() == "Done\n"
        s.sendall(b"create dip\n")
        resp = fh.readline()
        assert resp in ("Done\n", "Delete in progress\n")
        if resp == "Done\n":
            s.sendall(b"drop dip\n")
            assert fh.readline() == "Done\n"
    # deferred-vacuum path: pending delete blocks re-create
    with server.registry_lock:
        server.registry.create("dip2")
        server.registry.drop("dip2", defer_vacuum=True)
        from hlld_spark.registry import DELETE_IN_PROGRESS

        assert server.registry.create("dip2") == DELETE_IN_PROGRESS
        server.registry.vacuum()
        assert server.registry.create("dip2") == "Done"
    s.close()
