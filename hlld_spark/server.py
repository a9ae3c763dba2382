"""Minimal TCP server speaking the hlld wire protocol.

Line-oriented ASCII commands over TCP, one response per command, exactly
as the reference daemon serves them (/root/reference/src/networking.c —
there via libev + worker threads; here via a thread-per-connection
stdlib server, since the event-loop machinery is environment plumbing,
not semantics). An existing hlld client can point at this port and run
create/set/bulk/info/list/drop/close/clear/flush unchanged.

This is a convenience/compatibility shim for interactive use — the
distributed hot path is the Spark pipeline (operators/sketch.py), with
``SketchRegistry.add_dataframe`` bridging Spark builds into named sets.
"""

from __future__ import annotations

import socketserver
import threading

from .protocol import CommandHandler
from .registry import SketchRegistry


class _Conn(socketserver.StreamRequestHandler):
    def handle(self):
        handler: CommandHandler = self.server.command_handler  # type: ignore[attr-defined]
        lock: threading.Lock = self.server.registry_lock  # type: ignore[attr-defined]
        while True:
            line = self.rfile.readline()
            if not line:
                return
            try:
                text = line.decode("utf-8", errors="replace")
            except Exception:
                return
            with lock:
                resp = handler.handle_command(text)
            self.wfile.write(resp.encode("utf-8"))
            self.wfile.flush()


class HlldServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, data_dir: str, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Conn)
        self.registry = SketchRegistry(data_dir)
        self.command_handler = CommandHandler(self.registry)
        # one lock serializes registry mutation — the reference serializes
        # per-set updates with a spinlock (src/set.c:281-284); our bulk
        # path is vectorized so the critical section is the batch, not
        # the key
        self.registry_lock = threading.Lock()

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


def serve(data_dir: str, host: str = "127.0.0.1", port: int = 4553) -> None:
    """Blocking entrypoint: python -m hlld_spark.server /path/to/data
    (4553 is the reference's default tcp_port, src/config.c:21)."""
    srv = HlldServer(data_dir, host, port)
    print(f"hlld-spark serving on {host}:{srv.port}, data_dir={data_dir}")
    srv.serve_forever()


if __name__ == "__main__":
    import sys

    serve(sys.argv[1] if len(sys.argv) > 1 else "./hlld_data")
