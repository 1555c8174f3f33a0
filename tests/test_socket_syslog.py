"""S5 end-to-end: syslog over a real local TCP socket into the parsed
stream (dev-mode ingest path; production uses spool/Kafka + the same
parser — see sources/syslog.py)."""

from __future__ import annotations

import socket
import socketserver
import threading
import time

import pytest

LINES = [
    "<34>Jan 12 06:30:45 web01 sshd[2451]: Failed password for root",
    "<13>Feb  3 23:59:59 db-7 cron: job started",
]


class _Feeder(socketserver.BaseRequestHandler):
    def handle(self):
        payload = ("\n".join(LINES) + "\n").encode()
        self.request.sendall(payload)
        # keep the connection open so the source doesn't see EOF
        deadline = time.time() + 60
        while time.time() < deadline and not self.server._done.is_set():  # type: ignore[attr-defined]
            time.sleep(0.2)


def test_syslog_socket_stream_end_to_end(spark):
    from eventstreams_spark.sources.syslog import syslog_socket_stream

    server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Feeder)
    server._done = threading.Event()  # type: ignore[attr-defined]
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    q = None
    try:
        parsed = syslog_socket_stream(spark, "127.0.0.1", port)
        q = (
            parsed.writeStream.format("memory")
            .queryName("t_syslog_sock")
            .outputMode("append")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM t_syslog_sock").count() >= len(LINES):
                break
            time.sleep(0.5)
        rows = {r.host: r for r in spark.sql("SELECT * FROM t_syslog_sock").collect()}
        assert set(rows) >= {"web01", "db-7"}
        assert rows["web01"].app == "sshd"
        assert rows["web01"].severity == 2
        assert rows["db-7"].proc_id is None
    finally:
        if q is not None:
            q.stop()
        server._done.set()  # type: ignore[attr-defined]
        server.shutdown()
        server.server_close()
